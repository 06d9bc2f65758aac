"""Multi-host execution: a 2-process ``jax.distributed`` run must produce
a report bit-identical to the single-process one.

Each process scans its round-robin region shard on its own (CPU) device;
the integer score histograms merge through one collective, exact global
BH q-values fall out of the merged histogram on every host, hit rows are
gathered and reordered to the global hit order, and host 0 writes the
report (SURVEY.md §2.18/§5.8; reference analogue: the single-host mp.Pool
merge, score_sequences.py:133-157).
"""

import os
import socket
import subprocess
import sys

import pandas as pd
import pytest

from grafimo_tpu.cli import main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """\
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from grafimo_tpu.cli import main
sys.exit(main(sys.argv[1:]))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def dist_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dist")
    graph_dir = tmp / "graphs"
    graph_dir.mkdir()
    assert main(
        [
            "buildvg",
            "-l", os.path.join(REPO, "tests/data/input/test.fa"),
            "-v", os.path.join(REPO, "tests/data/input/test.vcf.gz"),
            "-o", str(graph_dir),
        ]
    ) == 0
    bed = tmp / "regions.bed"
    bed.write_text("chrx\t0\t20\nchrx\t15\t38\nchrx\t28\t50\n")
    return tmp, graph_dir, bed


def _find_args(graph_dir, bed, outdir, extra=()):
    return [
        "findmotif",
        "-d", str(graph_dir),
        "-b", str(bed),
        "-m", os.path.join(REPO, "tests/data/input/MA0139.1.meme"),
        "-t", "0.9",
        "--recomb",
        "-o", str(outdir),
        *extra,
    ]


def test_two_process_run_bit_identical(dist_setup):
    tmp, graph_dir, bed = dist_setup
    # single-process reference (in-process, 8 virtual devices)
    single_out = tmp / "single"
    assert main(_find_args(graph_dir, bed, single_out)) == 0
    want = pd.read_csv(single_out / "grafimo_out.tsv", sep="\t")

    driver = tmp / "driver.py"
    driver.write_text(DRIVER)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(2):
        out = tmp / f"proc{pid}"
        args = _find_args(
            graph_dir, bed, out,
            extra=[
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2",
                "--process-id", str(pid),
            ],
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(driver), *args],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outputs = []
    for p in procs:
        try:
            out_text, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out_text)
    for pid, (p, text) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{text}"
    # host 0 wrote the report; host 1 did not
    report0 = tmp / "proc0" / "grafimo_out.tsv"
    assert report0.exists()
    assert not (tmp / "proc1" / "grafimo_out.tsv").exists()
    got = pd.read_csv(report0, sep="\t")
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # byte-identical files, not just equal frames
    assert report0.read_bytes() == (single_out / "grafimo_out.tsv").read_bytes()
    # the counters printed by host 0 are GLOBAL totals
    assert "Scanned sequences:" in outputs[0]
    assert "Scanned sequences:" not in outputs[1]
