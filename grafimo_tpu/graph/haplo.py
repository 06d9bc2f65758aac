"""Haplotype index: the framework's GBWT replacement.

The reference delegates haplotype-aware window frequencies to ``vg find -H
chr.gbwt`` (``extract_regions.py:180``), whose GBWT stores each sample
haplotype as a path thread.  For VCF-derived graphs an equivalent but far
cheaper structure suffices: one bitset per (site, alt allele) over the ``H``
haplotypes, built straight from the phased GT matrix.

A window's haplotype frequency is the popcount of the AND of the bitsets of
its *determined* site choices (subpath semantics: a site constrains the count
only when the window's walk actually traverses the site's choice region —
see :mod:`grafimo_tpu.graph.enumerate`).  Windows determining no site are
contained in every haplotype, frequency ``H``.

This formulation is O(words) per window, embarrassingly parallel, trivially
shardable, and exactly reproduces GBWT subpath-count semantics on acyclic
VCF graphs.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class HaploIndex:
    """Per-(site, allele) haplotype bitsets.

    Parameters
    ----------
    n_hap:
        number of haplotypes (2 x samples for phased diploid VCFs).
    site_allele_rows:
        maps ``site_id`` to a dict ``allele_idx -> row`` into ``alt_bits``
        for every non-reference allele.
    alt_bits:
        ``(n_rows, W)`` uint64, bit h set when haplotype ``h`` carries that
        allele.
    """

    def __init__(
        self,
        n_hap: int,
        site_allele_rows: List[Dict[int, int]],
        alt_bits: np.ndarray,
    ):
        self.n_hap = n_hap
        self.words = (n_hap + 63) // 64
        self.site_allele_rows = site_allele_rows
        self.alt_bits = alt_bits
        # per-site OR of all alt bitsets: complement = ref-allele carriers
        n_sites = len(site_allele_rows)
        self.any_alt = np.zeros((n_sites, self.words), dtype=np.uint64)
        for sid, rows in enumerate(site_allele_rows):
            for row in rows.values():
                self.any_alt[sid] |= alt_bits[row]
        self._full = self._full_mask()

    def _full_mask(self) -> np.ndarray:
        full = np.full(self.words, ~np.uint64(0), dtype=np.uint64)
        rem = self.n_hap % 64
        if self.words and rem:
            full[-1] = (np.uint64(1) << np.uint64(rem)) - np.uint64(1)
        return full

    @staticmethod
    def from_genotypes(
        n_hap: int, site_gts: Sequence[Optional[Sequence[int]]]
    ) -> "HaploIndex":
        """Build from per-site genotypes: either allele-index-per-haplotype
        vectors, or pre-built ``{allele: uint64 bitset words}`` dicts (the
        native VCF scanner's output, ``native/vcfio.cpp``); ``None`` for
        sites without genotype data -> no carriers."""
        words = (n_hap + 63) // 64

        def to_words(mask: np.ndarray) -> np.ndarray:
            # bit h lives in word h >> 6 at position h & 63 — pack to
            # little-endian bytes then view as uint64 words
            by = np.packbits(mask, bitorder="little")
            out = np.zeros(words * 8, dtype=np.uint8)
            out[: len(by)] = by
            return out.view(np.uint64)

        rows: List[Dict[int, int]] = []
        bits: List[np.ndarray] = []
        for gts in site_gts:
            site_rows: Dict[int, int] = {}
            if isinstance(gts, dict):
                for a in sorted(gts):
                    src = np.asarray(gts[a], dtype=np.uint64)
                    row = np.zeros(words, dtype=np.uint64)
                    n = min(words, src.size)
                    row[:n] = src[:n]
                    if row.any():  # unique(arr[arr>0]) keeps carried alleles
                        site_rows[int(a)] = len(bits)
                        bits.append(row)
            elif gts is not None:
                arr = np.asarray(gts, dtype=np.int32)[:n_hap]
                for a in np.unique(arr[arr > 0]).tolist():
                    site_rows[int(a)] = len(bits)
                    bits.append(to_words(arr == a))
            rows.append(site_rows)
        alt_bits = (
            np.stack(bits) if bits else np.zeros((0, words), dtype=np.uint64)
        )
        return HaploIndex(n_hap, rows, alt_bits)

    def count(self, choices: Sequence[Tuple[int, int]]) -> int:
        """Haplotype frequency of a walk given its determined
        ``(site_id, allele_idx)`` choices."""
        acc = self._full.copy()
        for sid, allele in choices:
            if allele == 0:
                acc &= ~self.any_alt[sid] & self._full
            else:
                row = self.site_allele_rows[sid].get(allele)
                if row is None:
                    return 0  # allele carried by no haplotype
                acc &= self.alt_bits[row]
            if not acc.any():
                return 0
        return int(np.bitwise_count(acc).sum())

    # -- serialisation -----------------------------------------------------
    def to_arrays(self) -> Dict[str, np.ndarray]:
        flat_sites, flat_alleles, flat_rows = [], [], []
        for sid, rows in enumerate(self.site_allele_rows):
            for a, r in rows.items():
                flat_sites.append(sid)
                flat_alleles.append(a)
                flat_rows.append(r)
        return {
            "hap_n": np.array([self.n_hap], dtype=np.int64),
            "hap_nsites": np.array(
                [len(self.site_allele_rows)], dtype=np.int64
            ),
            "hap_map_site": np.array(flat_sites, dtype=np.int64),
            "hap_map_allele": np.array(flat_alleles, dtype=np.int64),
            "hap_map_row": np.array(flat_rows, dtype=np.int64),
            "hap_alt_bits": self.alt_bits,
        }

    @staticmethod
    def from_arrays(arrays) -> "HaploIndex":
        n_hap = int(arrays["hap_n"][0])
        n_sites = int(arrays["hap_nsites"][0])
        rows: List[Dict[int, int]] = [dict() for _ in range(n_sites)]
        for s, a, r in zip(
            arrays["hap_map_site"].tolist(),
            arrays["hap_map_allele"].tolist(),
            arrays["hap_map_row"].tolist(),
        ):
            rows[s][a] = r
        return HaploIndex(n_hap, rows, np.asarray(arrays["hap_alt_bits"]))
