#!/bin/bash
# ---------------------------------------------------------------------------
# GRAFIMO-TPU tutorial — build variation graphs and scan them for a motif.
#
# Mirrors the reference's buildvg + findmotif tutorials
# (tutorials/{buildvg,findmotif}_tutorial in pinellolab/GRAFIMO) on the same
# toy data: a two-chromosome genome (x, y), a phased VCF of SNPs and
# indels, a 15bp example motif, 86 BED regions and a background file — with
# no external vg/tabix dependency.
# ---------------------------------------------------------------------------
set -e
cd "$(dirname "$0")"

# 1. build per-chromosome variation graphs (replaces `vg construct` +
#    `vg index`); graphs land in mygenome/ as x.gvt.npz, y.gvt.npz
python -m grafimo_tpu buildvg \
    -l data/xy.fa -v data/xy2.vcf.gz -o mygenome --verbose

# 2. scan the example motif over the BED regions on both graphs.
#    The BED names chromosomes "chrx"/"chry" while the graph files are
#    named by plain chromosome ("x"/"y") — exactly the prefix situation the
#    reference handles with --chroms-prefix-find (empty prefix here).
python -m grafimo_tpu findmotif \
    -d mygenome \
    -b data/regions.bed \
    -m data/example.meme \
    -k data/bg_nt \
    -t 0.01 \
    -o grafimo_tpu_out \
    --verbose

echo
echo "results written to tutorials/grafimo_tpu_out/"
head -5 grafimo_tpu_out/grafimo_out.tsv
