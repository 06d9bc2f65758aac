"""Region extraction: graph -> WindowBatch tensors.

The reference's extraction stage shells out one ``vg find`` per (width,
region) into per-region TSVs (``extract_regions.py:55-239``); here the
enumeration engine streams windows straight into packed
:class:`~grafimo_tpu.windows.WindowBatch` tensors.

Strand handling: the enumerator produces forward walks only.  Reverse rows
are derived (reverse-complement sequence, swapped coordinates, reversed
``-``-oriented node path) which matches the vg kmer-table convention (toy
oracle rows ``x:0+ x:19+`` vs ``x:19- x:0-``).  The scoring layer can skip
materialising reverse rows entirely and score them with a
reverse-complemented PWM instead (``ops/score_jax.reverse_complement_pwm``).
"""

from typing import Iterable, List, Optional

import numpy as np

from grafimo_tpu.graph.enumerate import Window, enumerate_region_windows
from grafimo_tpu.graph.sitegraph import SiteGraph
from grafimo_tpu.windows import WindowBatch

_RC_TABLE = str.maketrans("ACGTN", "TGCAN")


def revcomp(seq: str) -> str:
    return seq.translate(_RC_TABLE)[::-1]


def path_string(path: List[int], strand: str) -> str:
    """vg-style node path column: ``1+,3+,5+,`` (trailing comma); reverse
    rows list nodes in walk order of the reverse strand."""
    if strand == "+":
        return "".join(f"{n}+," for n in path)
    return "".join(f"{n}-," for n in reversed(path))


def windows_to_batch(
    windows: Iterable[Window],
    width: int,
    chrom_display: str,
    region_start: int,
    region_end: int,
    both_strands: bool = True,
) -> WindowBatch:
    """Materialise enumerator output as a WindowBatch with the reference's
    TSV row semantics (one forward and one reverse row per walk)."""
    region_name = f"{chrom_display}:{region_start}-{region_end}"
    seqnames: List[str] = []
    seqs: List[str] = []
    chroms: List[str] = []
    starts: List[int] = []
    stops: List[int] = []
    strands: List[str] = []
    freqs: List[int] = []
    refs: List[str] = []
    paths: List[str] = []
    for w in windows:
        ref_flag = "ref" if w.is_ref else "non.ref"
        seqnames.append(region_name)
        seqs.append(w.seq)
        chroms.append(chrom_display)
        starts.append(w.begin)
        stops.append(w.end)
        strands.append("+")
        freqs.append(w.freq)
        refs.append(ref_flag)
        paths.append(path_string(w.path, "+"))
        if both_strands:
            seqnames.append(region_name)
            seqs.append(revcomp(w.seq))
            chroms.append(chrom_display)
            starts.append(w.end)
            stops.append(w.begin)
            strands.append("-")
            freqs.append(w.freq)
            refs.append(ref_flag)
            paths.append(path_string(w.path, "-"))
    return WindowBatch(
        width=width,
        seqnames=seqnames,
        seqs=seqs,
        chroms=chroms,
        starts=np.array(starts, dtype=np.int64),
        stops=np.array(stops, dtype=np.int64),
        strands=strands,
        freqs=np.array(freqs, dtype=np.int64),
        refs=refs,
        paths=paths,
    )


def extract_region(
    graph: SiteGraph,
    region_start: int,
    region_end: int,
    width: int,
    chrom_display: Optional[str] = None,
    both_strands: bool = True,
) -> WindowBatch:
    """Enumerate + batch one region (replaces one ``vg find`` call)."""
    windows = enumerate_region_windows(graph, region_start, region_end, width)
    return windows_to_batch(
        windows,
        width,
        chrom_display if chrom_display is not None else graph.chrom,
        region_start,
        region_end,
        both_strands=both_strands,
    )


def write_windows_tsv(batch: WindowBatch, path: str) -> None:
    """Dump a batch in the reference's 7-column extraction TSV format (for
    interop/debugging; the pipeline itself stays in memory)."""
    with open(path, "w") as out:
        for i in range(len(batch)):
            out.write(
                "\t".join(
                    [
                        batch.seqnames[i],
                        batch.seqs[i],
                        f"{batch.chroms[i]}:{batch.starts[i]}{batch.strands[i]}",
                        f"{batch.chroms[i]}:{batch.stops[i]}{batch.strands[i]}",
                        str(int(batch.freqs[i])),
                        batch.refs[i],
                        batch.paths[i] if batch.paths else "",
                    ]
                )
                + "\n"
            )
