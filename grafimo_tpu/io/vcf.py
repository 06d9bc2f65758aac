"""Minimal phased-VCF reader for graph construction.

The reference shells out to ``tabix`` + ``vg construct -v VCF``
(``constructVG.py:213-236,332``); here the VCF is parsed directly.  Only the
fields the graph builder needs are materialised: position, alleles and the
per-haplotype phased genotype matrix.
"""

import gzip
from dataclasses import dataclass
from typing import Iterator, List, Optional


@dataclass
class VcfRecord:
    chrom: str
    pos: int  # 1-based
    ref: str
    alts: List[str]
    # allele index per haplotype (0=ref, 1..=alts); length = 2 * n_samples
    # for diploid phased samples; None when the VCF has no samples
    gt: Optional[List[int]]


def _opener(fn: str):
    return gzip.open(fn, "rt") if fn.endswith(".gz") else open(fn)


def iter_vcf_records(
    fn: str, chrom: Optional[str] = None
) -> Iterator[VcfRecord]:
    """Yield records (optionally restricted to one chromosome).

    Genotypes are parsed from the GT field (first FORMAT key by VCF spec);
    ``|`` and ``/`` separators are both accepted (the reference pipeline
    requires phased VCFs; unphased calls are treated as listed).  Missing
    alleles (``.``) count as reference.
    """
    with _opener(fn) as handle:
        for line in handle:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            if chrom is not None and fields[0] != chrom:
                continue
            ref = fields[3].upper()
            alts = [a.upper() for a in fields[4].split(",") if a != "."]
            if not alts:
                continue
            # symbolic / breakend alleles are not representable as sequence
            if any(
                ("<" in a) or (">" in a) or ("[" in a) or ("]" in a)
                for a in alts
            ):
                continue
            gt: Optional[List[int]] = None
            if len(fields) > 9:
                gt = []
                for sample in fields[9:]:
                    gt_str = sample.split(":", 1)[0]
                    for al in gt_str.replace("|", "/").split("/"):
                        if al in (".", ""):
                            gt.append(0)
                        else:
                            gt.append(int(al))
            yield VcfRecord(
                chrom=fields[0],
                pos=int(fields[1]),
                ref=ref,
                alts=alts,
                gt=gt,
            )


def vcf_chroms(fn: str) -> List[str]:
    """Distinct chromosome names in record order."""
    seen = []
    seen_set = set()
    with _opener(fn) as handle:
        for line in handle:
            if line.startswith("#"):
                continue
            c = line.split("\t", 1)[0]
            if c not in seen_set:
                seen.append(c)
                seen_set.add(c)
    return seen
