"""Site-decomposed variation graph.

The framework's replacement for ``vg construct`` + ``vg index`` XG/GBWT
artifacts (reference ``constructVG.py:296-404``).  A VCF-derived variation
graph is a linear reference backbone with local *sites* (bubbles); this
structure stores exactly that:

* reference segments between variant sites — one node each;
* per site: the trimmed ref allele span and the alt allele sequences, with
  vg-compatible node numbering (alt allele nodes first, then the ref-allele
  node — observed from the reference's toy fixture node paths,
  ``tests/test_data/expected_results/expected_seqs.tsv``);
* deletions are edges that skip the ref-allele node (no alt node), pure
  insertions are alt nodes with an empty ref span — matching how ``vg
  construct`` models them (the chr22 fixture shows deletion walks labelled
  ``ref`` with span > k, reclassified downstream like the reference does at
  ``score_sequences.py:305-307``).

Node IDs are 1-based and assigned in genomic order.  The graph serialises to
a single ``.gvt`` npz file (arrays only, no pickle).
"""

import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from grafimo_tpu.graph.haplo import HaploIndex
from grafimo_tpu.io.vcf import VcfRecord


@dataclass
class Site:
    site_id: int
    ref_start: int  # 0-based, allele-trimmed
    ref_end: int  # 0-based exclusive; == ref_start for pure insertions
    alleles: List[str]  # index 0 = trimmed ref allele ("" for insertion)
    allele_nodes: List[int]  # node id per allele; 0 = no node (empty allele)


@dataclass
class SiteGraph:
    chrom: str
    seq: str  # uppercase reference sequence
    sites: List[Site]
    # per-node arrays (1-based ids; index 0 unused)
    node_ref_start: np.ndarray  # int64: ref coord of node start / site start
    node_ref_end: np.ndarray  # int64: ref coord after node's ref span
    node_is_ref: np.ndarray  # bool: on the reference path
    node_seqs: List[str]  # node sequences (index 0 = "")
    # reference backbone segments: (ref_start, ref_end, node_id)
    segments: List[Tuple[int, int, int]]
    haplo: Optional[HaploIndex] = None
    # elements: genomic-order walk skeleton ("seg", node_id) | ("site", id)
    elements: List[Tuple[str, int]] = field(default_factory=list)

    @property
    def n_nodes(self) -> int:
        return len(self.node_seqs) - 1

    def ref_node_at(self, coord: int) -> int:
        """Reference-path node covering a ref coordinate (binary search
        over the segment/ref-allele partition of ``[0, len(seq))``)."""
        starts, nodes = self._ref_cover()
        i = int(np.searchsorted(starts, coord, side="right")) - 1
        return int(nodes[i]) if i >= 0 else 0

    def site_spans(self):
        """Cached ``(starts, ends)`` int64 arrays over the (sorted,
        non-overlapping) sites, for binary-search region queries."""
        spans = getattr(self, "_site_spans_cache", None)
        if spans is None:
            spans = (
                np.array([s.ref_start for s in self.sites], dtype=np.int64),
                np.array([s.ref_end for s in self.sites], dtype=np.int64),
            )
            self._site_spans_cache = spans
        return spans

    def _ref_cover(self):
        cover = getattr(self, "_ref_cover_cache", None)
        if cover is None:
            spans = [(s, nid) for (s, _e, nid) in self.segments]
            spans += [
                (st.ref_start, st.allele_nodes[0])
                for st in self.sites
                if st.ref_end > st.ref_start
            ]
            spans.sort()
            cover = (
                np.array([s for s, _ in spans], dtype=np.int64),
                np.array([n for _, n in spans], dtype=np.int64),
            )
            self._ref_cover_cache = cover
        return cover

    @property
    def length(self) -> int:
        return len(self.seq)

    # -- serialisation -----------------------------------------------------
    def save(self, path: str) -> None:
        meta = {
            "chrom": self.chrom,
            "sites": [
                {
                    "s": s.ref_start,
                    "e": s.ref_end,
                    "a": s.alleles,
                    "n": s.allele_nodes,
                }
                for s in self.sites
            ],
            "segments": self.segments,
            "elements": self.elements,
        }
        arrays = {
            "meta": np.frombuffer(
                json.dumps(meta).encode("utf-8"), dtype=np.uint8
            ),
            "seq": np.frombuffer(self.seq.encode("ascii"), dtype=np.uint8),
            "node_ref_start": self.node_ref_start,
            "node_ref_end": self.node_ref_end,
            "node_is_ref": self.node_is_ref,
            "node_seqs": np.frombuffer(
                "\n".join(self.node_seqs).encode("ascii"), dtype=np.uint8
            ),
        }
        if self.haplo is not None:
            arrays.update(self.haplo.to_arrays())
        np.savez_compressed(path, **arrays)

    @staticmethod
    def load(path: str) -> "SiteGraph":
        with np.load(path) as data:
            meta = json.loads(bytes(data["meta"]).decode("utf-8"))
            sites = [
                Site(i, d["s"], d["e"], d["a"], d["n"])
                for i, d in enumerate(meta["sites"])
            ]
            haplo = (
                HaploIndex.from_arrays(data) if "hap_n" in data else None
            )
            return SiteGraph(
                chrom=meta["chrom"],
                seq=bytes(data["seq"]).decode("ascii"),
                sites=sites,
                node_ref_start=data["node_ref_start"],
                node_ref_end=data["node_ref_end"],
                node_is_ref=data["node_is_ref"],
                node_seqs=bytes(data["node_seqs"]).decode("ascii").split("\n"),
                segments=[tuple(s) for s in meta["segments"]],
                haplo=haplo,
                elements=[tuple(e) for e in meta["elements"]],
            )


def _trim_record(rec: VcfRecord) -> Tuple[int, str, List[str]]:
    """Trim the common prefix shared by ref and ALL alts (the VCF anchor
    base); returns (0-based trimmed start, trimmed ref, trimmed alts)."""
    cp = 0
    seqs = [rec.ref] + rec.alts
    min_len = min(len(s) for s in seqs)
    while cp < min_len and len({s[cp] for s in seqs}) == 1:
        cp += 1
    # always keep at least one base of difference; for identical pairs the
    # record is degenerate and cp stops at min_len-?; clamp so ref'/alt'
    # are consistent
    start0 = rec.pos - 1 + cp
    return start0, rec.ref[cp:], [a[cp:] for a in rec.alts]


def build_graph(
    chrom: str,
    seq: str,
    records: List[VcfRecord],
    n_hap: Optional[int] = None,
    with_haplotypes: bool = True,
) -> SiteGraph:
    """Build the site graph for one chromosome from its reference sequence
    and VCF records (replaces ``vg construct -R chrom -C -a`` + ``vg index
    -G .gbwt -v VCF``, reference ``constructVG.py:296-404``)."""
    seq = seq.upper()
    # normalise + sort + drop overlapping records (the reference delegates
    # overlap resolution to vg; v1 keeps the first record of an overlap)
    trimmed = []
    for rec in records:
        if rec.chrom != chrom:
            continue
        start0, ref_t, alts_t = _trim_record(rec)
        if start0 + len(ref_t) > len(seq):
            continue
        if ref_t and seq[start0 : start0 + len(ref_t)] != ref_t:
            continue  # ref mismatch: skip record
        trimmed.append((start0, ref_t, alts_t, rec.gt))
    trimmed.sort(key=lambda t: (t[0], t[0] + len(t[1])))

    sites: List[Site] = []
    site_gts: List[Optional[np.ndarray]] = []
    last_end = 0
    for start0, ref_t, alts_t, gt in trimmed:
        end0 = start0 + len(ref_t)
        if start0 < last_end:
            continue  # overlapping record: keep the first (see docstring)
        sites.append(
            Site(
                site_id=len(sites),
                ref_start=start0,
                ref_end=end0,
                alleles=[ref_t] + alts_t,
                allele_nodes=[0] * (1 + len(alts_t)),
            )
        )
        site_gts.append(
            gt
            if gt is None or isinstance(gt, dict)
            else np.asarray(gt, dtype=np.int32)
        )
        last_end = max(last_end, end0)

    # assign nodes in genomic order: ref segment, then per site alt nodes
    # (VCF order) followed by the ref-allele node
    node_seqs: List[str] = [""]
    node_ref_start: List[int] = [0]
    node_ref_end: List[int] = [0]
    node_is_ref: List[bool] = [False]
    segments: List[Tuple[int, int, int]] = []
    elements: List[Tuple[str, int]] = []

    def add_node(s: str, rs: int, re_: int, is_ref: bool) -> int:
        node_seqs.append(s)
        node_ref_start.append(rs)
        node_ref_end.append(re_)
        node_is_ref.append(is_ref)
        return len(node_seqs) - 1

    pos = 0
    for site in sites:
        if site.ref_start > pos:
            nid = add_node(seq[pos : site.ref_start], pos, site.ref_start, True)
            segments.append((pos, site.ref_start, nid))
            elements.append(("seg", nid))
        # alt allele nodes first (vg numbering, toy fixture parity)
        for a_idx in range(1, len(site.alleles)):
            allele = site.alleles[a_idx]
            if allele:
                site.allele_nodes[a_idx] = add_node(
                    allele, site.ref_start, site.ref_end, False
                )
        if site.alleles[0]:
            site.allele_nodes[0] = add_node(
                site.alleles[0], site.ref_start, site.ref_end, True
            )
        elements.append(("site", site.site_id))
        pos = site.ref_end
    if pos < len(seq):
        nid = add_node(seq[pos:], pos, len(seq), True)
        segments.append((pos, len(seq), nid))
        elements.append(("seg", nid))

    haplo = None
    if with_haplotypes:
        if n_hap is None:
            # bitset dicts carry no length — the native path supplies
            # n_hap explicitly (workflows.buildvg)
            n_hap = max(
                (
                    len(g)
                    for g in site_gts
                    if g is not None and not isinstance(g, dict)
                ),
                default=0,
            )
        if n_hap:
            haplo = HaploIndex.from_genotypes(n_hap, site_gts)

    return SiteGraph(
        chrom=chrom,
        seq=seq,
        sites=sites,
        node_ref_start=np.array(node_ref_start, dtype=np.int64),
        node_ref_end=np.array(node_ref_end, dtype=np.int64),
        node_is_ref=np.array(node_is_ref, dtype=bool),
        node_seqs=node_seqs,
        segments=segments,
        haplo=haplo,
        elements=elements,
    )
