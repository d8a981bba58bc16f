"""
Gene-level profiling (reference: inStrain/GeneProfile.py).

Parses prodigal .fna / GenBank gene files, computes per-gene per-mm
coverage, clonality and SNP counts, classifies SNVs as synonymous /
non-synonymous / intergenic by codon translation, and derives
dN/dS (substitutions) and pN/pS (variants).

Faithful quirks preserved:
  - direction is compared against the string '-1'
    (GeneProfile.py:666,682) — GenBank integer strands therefore never
    match, exactly as in the reference
  - the mutation label uses the nucleotide offset within the gene
    (GeneProfile.py:694-698)
  - gene SNV counts use allele_count == 2 exactly (GeneProfile.py:578)
"""

from __future__ import annotations

import logging
import re
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from ..io import fasta as fasta_io
from .pileup import ScaffoldStats
from .tables import _ffill_along_mm

# ---------------- codon machinery ----------------

_BASES = "TCAG"
_AAS = ("FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRR"
        "IIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG")
CODON_TABLE: Dict[str, str] = {}
STOP_CODONS: List[str] = []
for _i, (_b1, _b2, _b3) in enumerate(
        [(a, b, c) for a in _BASES for b in _BASES for c in _BASES]):
    _codon = _b1 + _b2 + _b3
    if _AAS[_i] == "*":
        STOP_CODONS.append(_codon)
    CODON_TABLE[_codon] = _AAS[_i]

_COMP = str.maketrans("ACGTacgtNn", "TGCAtgcaNn")


def revcomp(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


def translate(seq: str) -> str:
    """Standard-table translation, stops as '*', X for ambiguous codons."""
    aas = []
    for i in range(0, len(seq) - len(seq) % 3, 3):
        aas.append(CODON_TABLE.get(seq[i:i + 3].upper(), "X"))
    return "".join(aas)


def count_sites(seq: str, k: float = 1.0) -> Tuple[float, float]:
    """
    Synonymous / non-synonymous site counts per codon with transversions
    weighted by k, normalized to 3 sites per codon
    (reference: GeneProfile.count_sites, 448-512).
    """
    purine = ("A", "G")
    pyrimidine = ("T", "C")
    S_site = 0.0
    N_site = 0.0
    for i in range(0, len(seq) - len(seq) % 3, 3):
        codon = seq[i:i + 3].upper().replace("U", "T")
        if codon == "---" or "N" in codon:
            continue
        if codon in STOP_CODONS:
            continue
        if codon not in CODON_TABLE:
            continue
        aa = CODON_TABLE[codon]
        s = n = 0.0
        for pos_in_codon, orig in enumerate(codon):
            for sub in "ATCG":
                if sub == orig:
                    continue
                transition = ((orig in purine and sub in purine) or
                              (orig in pyrimidine and sub in pyrimidine))
                w = 1.0 if transition else k
                neighbor = (codon[:pos_in_codon] + sub +
                            codon[pos_in_codon + 1:])
                if neighbor in STOP_CODONS:
                    n += w
                elif CODON_TABLE[neighbor] == aa:
                    s += w
                else:
                    n += w
        norm = (n + s) / 3.0
        if norm > 0:
            S_site += s / norm
            N_site += n / norm
    return S_site, N_site


# ---------------- gene file parsing ----------------

@dataclass
class GeneData:
    gene_table: pd.DataFrame                  # all scaffolds concatenated
    scaff2genes: Dict[str, pd.DataFrame]
    gene2sequence: Dict[str, str]


def parse_genes(path: str) -> GeneData:
    """Dispatch on extension (reference: GeneProfile.parse_genes)."""
    if path.endswith(".fna") or path.endswith(".fa"):
        return parse_prodigal_genes(path)
    if path.endswith(".gb") or path.endswith(".gbk"):
        return parse_genbank_genes(path)
    raise ValueError(f"do not know how to parse gene file {path}")


def parse_prodigal_genes(path: str) -> GeneData:
    """
    Prodigal .fna headers: >gene # start # end # strand # meta
    (1-based inclusive -> converted to 0-based;
    reference: GeneProfile.py:770-811).
    """
    scaff2rows: Dict[str, list] = defaultdict(list)
    gene2seq: Dict[str, str] = {}
    name = None
    desc = None
    chunks: List[str] = []

    def flush():
        if name is None:
            return
        seq = "".join(chunks)
        parts = desc.split("#")
        start = int(parts[1].strip()) - 1
        end = int(parts[2].strip()) - 1
        scaff = "_".join(name.split("_")[:-1])
        scaff2rows[scaff].append(dict(
            gene=name, scaffold=scaff,
            direction=parts[3].strip(),
            partial="partial=01" in desc,
            start=start, end=end))
        gene2seq[name] = seq
        if (end - start) + 1 != len(seq):
            logging.error(f"ERROR PARSING GENE {name}; start={start} "
                          f"end={end} length={len(seq)}")

    with fasta_io._open(path) as f:
        for raw in f:
            line = raw.decode().rstrip()
            if line.startswith(">"):
                flush()
                desc = line[1:]
                name = desc.split()[0]
                chunks = []
            elif line:
                chunks.append(line)
    flush()

    scaff2genes = {s: pd.DataFrame(rows) for s, rows in scaff2rows.items()}
    gene_table = (pd.concat(scaff2genes.values()).reset_index(drop=True)
                  if scaff2genes else pd.DataFrame())
    return GeneData(gene_table, scaff2genes, gene2seq)


def parse_genbank_genes(path: str, gene_name: str = "gene") -> GeneData:
    """Minimal GenBank CDS parser (reference: GeneProfile.py:813-850)."""
    scaff2rows: Dict[str, list] = defaultdict(list)
    gene2seq: Dict[str, str] = {}
    text = open(path).read()
    for record in text.split("//\n"):
        if "LOCUS" not in record:
            continue
        m = re.search(r"^VERSION\s+(\S+)", record, re.M)
        if not m:
            m = re.search(r"^LOCUS\s+(\S+)", record, re.M)
        scaffold = m.group(1)
        origin = record.split("ORIGIN")[-1]
        seq = "".join(re.findall("[a-zA-Z]+", origin)).upper()

        for fm in re.finditer(
                r"^ {5}CDS {13}(.+?)(?=^ {5}\S|^ORIGIN)", record,
                re.M | re.S):
            block = fm.group(1)
            header = block.splitlines()[0].strip()
            # continuation lines of the location
            loc_str = header
            for line in block.splitlines()[1:]:
                ls = line.strip()
                if ls.startswith("/"):
                    break
                loc_str += ls
            gm = re.search(r'/%s="([^"]+)"' % gene_name, block)
            if not gm:
                continue
            gene = gm.group(1)
            compound = "join" in loc_str
            strand = -1 if "complement" in loc_str else 1
            spans = [(int(a) - 1, int(b) - 1) for a, b in
                     re.findall(r"<?(\d+)\.\.>?(\d+)", loc_str)]
            if not spans:
                continue
            start = min(s for s, _ in spans)
            end = max(e for _, e in spans)
            pieces = [seq[s:e + 1] for s, e in spans]
            gseq = "".join(pieces)
            if strand == -1:
                gseq = revcomp(gseq)
            scaff2rows[scaffold].append(dict(
                gene=gene, scaffold=scaffold, direction=strand,
                partial="compound" if compound else False,
                start=start, end=end))
            gene2seq[gene] = gseq

    scaff2genes = {s: pd.DataFrame(rows) for s, rows in scaff2rows.items()}
    gene_table = (pd.concat(scaff2genes.values()).reset_index(drop=True)
                  if scaff2genes else pd.DataFrame())
    return GeneData(gene_table, scaff2genes, gene2seq)


# ---------------- per-scaffold gene profiling ----------------

def profile_genes_for_scaffold(scaffold: str, gene_data: GeneData,
                               stats: ScaffoldStats,
                               cumulative_snv_table: pd.DataFrame):
    """
    reference: GeneProfile.profile_genes_from_profile (304-350).
    Returns (coverage, clonality, SNP_counts, SNP_mutation_types) tables.
    """
    gdb = gene_data.scaff2genes[scaffold]
    cdb = calc_gene_coverage(gdb, stats)
    cldb = calc_gene_clonality(gdb, stats)
    sdb = characterize_snps_wrapper(cumulative_snv_table, gdb,
                                    gene_data.gene2sequence)
    ldb = calc_gene_snp_counts(gdb, cumulative_snv_table, sdb,
                               gene_data.gene2sequence)
    if len(sdb) > 0:
        sdb = sdb.copy()
        sdb["scaffold"] = scaffold
    return cdb, cldb, ldb, sdb


def _gene_ranges(gdb: pd.DataFrame, L: int):
    starts = gdb["start"].values.astype(int)
    ends = np.minimum(gdb["end"].values.astype(int), L - 1)
    lens = np.abs(gdb["end"].values - gdb["start"].values) + 1
    return starts, ends, lens


def calc_gene_coverage(gdb: pd.DataFrame, stats: ScaffoldStats
                       ) -> pd.DataFrame:
    """Per-gene per-mm coverage/breadth (reference: 352-371)."""
    L = stats.pileup.length
    starts, ends, lens = _gene_ranges(gdb, L)
    total = stats.total.astype(np.float64)         # [M, L] cumulative
    exact = stats.pileup.counts_exact.sum(axis=1)
    covered = np.cumsum(exact, axis=0) > 0         # [M, L]

    csum = np.concatenate([np.zeros((total.shape[0], 1)),
                           np.cumsum(total, axis=1)], axis=1)
    bsum = np.concatenate([np.zeros((covered.shape[0], 1)),
                           np.cumsum(covered, axis=1)], axis=1)
    table = defaultdict(list)
    for mi, mm in enumerate(stats.mm_values):
        if not covered[mi].any():
            continue  # reference skips empty cumulative levels (358-360)
        gcov = csum[mi, ends + 1] - csum[mi, starts]
        gbre = bsum[mi, ends + 1] - bsum[mi, starts]
        for g, c, b, ln in zip(gdb["gene"], gcov, gbre, lens):
            table["gene"].append(g)
            table["coverage"].append(c / ln)
            table["breadth"].append(b / ln)
            table["mm"].append(int(mm))
    return pd.DataFrame(table)


def calc_gene_clonality(gdb: pd.DataFrame, stats: ScaffoldStats
                        ) -> pd.DataFrame:
    """Per-gene per-mm nucleotide diversity (reference: 396-422)."""
    L = stats.pileup.length
    starts, ends, lens = _gene_ranges(gdb, L)
    clon_f, clon_has, _ = _ffill_along_mm(stats.clon, ~np.isnan(stats.clon))
    vals = np.where(clon_has, clon_f, 0.0)
    vsum = np.concatenate([np.zeros((vals.shape[0], 1)),
                           np.cumsum(vals, axis=1)], axis=1)
    hsum = np.concatenate([np.zeros((vals.shape[0], 1)),
                           np.cumsum(clon_has, axis=1)], axis=1)
    table = defaultdict(list)
    for mi, mm in enumerate(stats.mm_values):
        if not clon_has[mi].any():
            continue  # reference skips levels with no clonality (402-404)
        v = vsum[mi, ends + 1] - vsum[mi, starts]
        h = hsum[mi, ends + 1] - hsum[mi, starts]
        for g, vv, hh, ln in zip(gdb["gene"], v, h, lens):
            table["gene"].append(g)
            micro = 1 - (vv / hh) if hh > 0 else np.nan
            table["nucl_diversity"].append(micro)
            table["breadth_minCov"].append(hh / ln)
            table["mm"].append(int(mm))
    return pd.DataFrame(table)


def characterize_snps_wrapper(Ldb: pd.DataFrame, gdb: pd.DataFrame,
                              gene2sequence: Dict[str, str]) -> pd.DataFrame:
    """reference: Characterize_SNPs_wrapper (600-642)."""
    if Ldb is None or len(Ldb) == 0:
        return pd.DataFrame()
    Sdb = (Ldb.drop_duplicates(subset=["scaffold", "position"], keep="last")
              .sort_index().drop(columns=["mm"]))
    Sdb = Sdb.copy()
    Sdb["position"] = Sdb["position"].astype(int)
    col = "morphia" if "morphia" in Sdb.columns else "allele_count"
    Sdb[col] = Sdb[col].astype(int)
    Sdb = Sdb[(Sdb[col] > 0) & (Sdb[col] <= 2)]
    if len(Sdb) == 0:
        return pd.DataFrame()
    sdb = characterize_snps(gdb, Sdb, gene2sequence)
    merged = pd.merge(Sdb, sdb, on=["position"], how="left").reset_index(
        drop=True)
    return merged


def characterize_snps(gdb: pd.DataFrame, Sdb: pd.DataFrame,
                      gene2sequence: Dict[str, str]) -> pd.DataFrame:
    """reference: characterize_SNPs (644-707)."""
    table = defaultdict(list)
    starts = gdb["start"].values
    ends = gdb["end"].values
    for _, row in Sdb.iterrows():
        pos = row["position"]
        hits = np.nonzero((starts <= pos) & (ends >= pos))[0]
        if len(hits) == 0:
            table["position"].append(pos)
            table["mutation_type"].append("I")
            table["mutation"].append("")
            table["gene"].append("")
        elif len(hits) > 1:
            table["position"].append(pos)
            table["mutation_type"].append("M")
            table["mutation"].append("")
            table["gene"].append(
                ",".join(gdb.iloc[hits]["gene"].tolist()))
        else:
            g = gdb.iloc[hits[0]]
            original = gene2sequence[g["gene"]]
            # string-equality like the reference (GeneProfile.py:666):
            # GenBank integer strands intentionally never match
            if g["direction"] == "-1":
                original = revcomp(original)
            snp_start = int(pos - g["start"])
            new = list(original)
            if 0 <= snp_start < len(new):
                new[snp_start] = row["con_base"]
                if new[snp_start] == original[snp_start]:
                    new[snp_start] = row["var_base"]
            new = "".join(new)

            if g["direction"] == "-1":
                old_aa = translate(revcomp(original))
                new_aa = translate(revcomp(new))
            else:
                old_aa = translate(original)
                new_aa = translate(new)

            mut_type = "S"
            mut = "S:" + str(snp_start)
            for aa in range(len(old_aa)):
                if new_aa[aa] != old_aa[aa]:
                    mut_type = "N"
                    mut = "N:" + str(old_aa[aa]) + str(snp_start) + \
                        str(new_aa[aa])
                    break
            table["position"].append(pos)
            table["mutation_type"].append(mut_type)
            table["mutation"].append(mut)
            table["gene"].append(g["gene"])
    return pd.DataFrame(table)


def calc_gene_snp_counts(gdb: pd.DataFrame, ldb: pd.DataFrame,
                         sdb: pd.DataFrame,
                         gene2sequence: Dict[str, str]) -> pd.DataFrame:
    """reference: calc_gene_snp_counts (522-598)."""
    if ldb is None or len(ldb) == 0:
        return pd.DataFrame()
    if len(sdb) == 0:
        sdb = pd.DataFrame({"position": [], "mutation_type": [],
                            "gene": []})
    xdb = pd.merge(ldb, sdb[["position", "mutation_type", "gene"]],
                   on=["position"], how="left").reset_index(drop=True)

    site_rows = []
    for _, row in gdb.iterrows():
        try:
            S_site, N_site = count_sites(gene2sequence[row["gene"]])
        except Exception:
            S_site = N_site = np.nan
        site_rows.append((row["gene"], S_site, N_site))
    SiteDb = pd.DataFrame(site_rows, columns=["gene", "S_sites", "N_sites"])

    table = defaultdict(list)
    for mm in sorted(xdb["mm"].unique()):
        fdb = (xdb[xdb["mm"] <= mm].sort_values("mm")
               .drop_duplicates(subset=["scaffold", "position"], keep="last")
               .sort_values("position").set_index("position"))
        pos_arr = fdb.index.values
        ac_arr = fdb["allele_count"].values
        mt_arr = fdb["mutation_type"].values
        for _, row in gdb.iterrows():
            lo = np.searchsorted(pos_arr, int(row["start"]), side="left")
            hi = np.searchsorted(pos_arr, int(row["end"]), side="right")
            ac = ac_arr[lo:hi]
            mt = mt_arr[lo:hi]
            g_len = abs(row["end"] - row["start"]) + 1
            table["mm"].append(int(mm))
            table["gene"].append(row["gene"])
            table["gene_length"].append(g_len)
            table["divergent_site_count"].append(hi - lo)
            for allele_count, nm in zip([1, 2], ["SNS", "SNV"]):
                table[f"{nm}_count"].append(int((ac == allele_count).sum()))
                for snp_type in ["N", "S"]:
                    table[f"{nm}_{snp_type}_count"].append(
                        int(((ac == allele_count) &
                             (mt == snp_type)).sum()))
    GGdb = pd.DataFrame(table).merge(SiteDb, on="gene",
                                     how="left").reset_index(drop=True)
    GGdb["dNdS_substitutions"] = [
        ((nC / nS) / (sC / sS)) if ((sC > 0) and (sS > 0)) else np.nan
        for nC, nS, sC, sS in zip(GGdb["SNS_N_count"], GGdb["N_sites"],
                                  GGdb["SNS_S_count"], GGdb["S_sites"])]
    GGdb["pNpS_variants"] = [
        ((nC / nS) / (sC / sS)) if ((sC > 0) and (sS > 0)) else np.nan
        for nC, nS, sC, sS in zip(GGdb["SNV_N_count"], GGdb["N_sites"],
                                  GGdb["SNV_S_count"], GGdb["S_sites"])]
    return GGdb


# ---------------- standalone operation (from a stored profile) ----------------

def _series_gene_slices(series: pd.Series, starts, ends):
    """sum and count of series values within [start, end] per gene."""
    pos = series.index.values
    vals = series.values.astype(np.float64)
    csum = np.concatenate([[0], np.cumsum(vals)])
    lo = np.searchsorted(pos, starts, side="left")
    hi = np.searchsorted(pos, ends + 1, side="left")
    return csum[hi] - csum[lo], hi - lo


def calc_gene_coverage_series(gdb: pd.DataFrame, covT) -> pd.DataFrame:
    """calc_gene_coverage working on stored mm->Series coverage
    (reference: GeneProfile.py:352-394)."""
    starts = gdb["start"].values.astype(int)
    ends = gdb["end"].values.astype(int)
    lens = np.abs(gdb["end"].values - gdb["start"].values) + 1
    table = defaultdict(list)
    counts = pd.Series(dtype="float64")
    for mm in sorted(int(m) for m in covT.keys()):
        counts = counts.add(covT[mm], fill_value=0)
        if len(counts) == 0:
            continue
        sums, ns = _series_gene_slices(counts, starts, ends)
        for g, s, n, ln in zip(gdb["gene"], sums, ns, lens):
            table["gene"].append(g)
            table["coverage"].append(s / ln)
            table["breadth"].append(n / ln)
            table["mm"].append(mm)
    return pd.DataFrame(table)


def calc_gene_clonality_series(gdb: pd.DataFrame, clonT) -> pd.DataFrame:
    """calc_gene_clonality on stored mm->Series clonality
    (reference: GeneProfile.py:373-422, union-of-latest semantics)."""
    starts = gdb["start"].values.astype(int)
    ends = gdb["end"].values.astype(int)
    lens = np.abs(gdb["end"].values - gdb["start"].values) + 1
    table = defaultdict(list)
    p2c: Dict[int, float] = {}
    for mm in sorted(int(m) for m in clonT.keys()):
        for pos, val in clonT[mm].items():
            p2c[pos] = val
        if not p2c:
            continue
        combined = pd.Series(p2c).sort_index()
        sums, ns = _series_gene_slices(combined, starts, ends)
        for g, s, n, ln in zip(gdb["gene"], sums, ns, lens):
            table["gene"].append(g)
            table["nucl_diversity"].append(
                1 - (s / n) if n > 0 else np.nan)
            table["breadth_minCov"].append(n / ln)
            table["mm"].append(mm)
    return pd.DataFrame(table)


def profile_genes_from_store(isdir, gene_file: str,
                             store_everything: bool = False):
    """
    The standalone `profile_genes` operation: load covT/clonT/SNV table
    from a stored profile and compute all gene-level tables
    (reference: GeneProfile.Controller.main, 37-69).
    """
    from ..store import generate as gen_mod

    gene_data = parse_genes(gene_file)
    scaffolds_with_genes = set(gene_data.scaff2genes.keys())
    scaffolds_in = set(isdir.covt_scaffolds())
    todo = sorted(scaffolds_with_genes & scaffolds_in)
    logging.info(f"{len(scaffolds_with_genes)} scaffolds with genes; "
                 f"{len(scaffolds_in)} in profile; {len(todo)} to profile")

    snv = isdir.get("cumulative_snv_table")
    if snv is None or len(snv) == 0:
        snv = pd.DataFrame(columns=["scaffold"])
    else:
        snv = snv.rename(columns={
            "conBase": "con_base", "refBase": "ref_base",
            "varBase": "var_base", "baseCoverage": "position_coverage"})
        snv = snv.sort_values("mm")
    covTs = isdir.get("covT", scaffolds=todo)
    clonTs = isdir.get("clonT", scaffolds=todo)

    results = []
    for scaffold in todo:
        try:
            gdb = gene_data.scaff2genes[scaffold]
            cdb = (calc_gene_coverage_series(gdb, covTs[scaffold])
                   if scaffold in covTs else pd.DataFrame())
            cldb = (calc_gene_clonality_series(gdb, clonTs[scaffold])
                    if scaffold in clonTs else pd.DataFrame())
            ldb_in = snv[snv["scaffold"] == scaffold]
            sdb = characterize_snps_wrapper(ldb_in, gdb,
                                            gene_data.gene2sequence)
            ldb = calc_gene_snp_counts(gdb, ldb_in, sdb,
                                       gene_data.gene2sequence)
            if len(sdb):
                sdb = sdb.copy()
                sdb["scaffold"] = scaffold
            results.append((cdb, cldb, ldb, sdb))
        except Exception as e:
            from ..obs.logging import log_failure
            log_failure("GeneException", scaffold, str(e))

    def cat(i):
        dfs = [r[i] for r in results if len(r[i])]
        return pd.concat(dfs).reset_index(drop=True) if dfs \
            else pd.DataFrame()

    isdir.store("genes_fileloc", gene_file, "value",
                "Location of genes file that was used to call genes")
    isdir.store("genes_table", gene_data.gene_table, "pandas",
                "Location of genes in the associated genes_file")
    isdir.store("genes_coverage", cat(0), "pandas",
                "Coverage of individual genes")
    isdir.store("genes_clonality", cat(1), "pandas",
                "Clonality of individual genes")
    isdir.store("genes_SNP_count", cat(2), "pandas",
                "SNP density and counts of individual genes")
    isdir.store("SNP_mutation_types", cat(3), "pandas",
                "The mutation types of SNPs")
    if store_everything:
        isdir.store("scaff2gene2sequence",
                    {s: {g: gene_data.gene2sequence[g]
                         for g in df["gene"]}
                     for s, df in gene_data.scaff2genes.items()},
                    "pickle", "scaffold -> gene -> sequence")
    gen_mod.generate(isdir, "gene_info")
    gen_mod.generate(isdir, "SNVs")
    return isdir
