"""
The 10 numbered plots (reference: inStrain/plotting/*.py; output names and
content match the reference's figures/ PDFs).
"""

from __future__ import annotations

import logging
from typing import Optional

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from ..store import generate as gen  # noqa: E402
from ..store.profile_dir import ProfileDir  # noqa: E402


def _figpath(isdir: ProfileDir, name: str) -> str:
    base = (isdir.get_location("figures") +
            str(isdir.get("location")).split("/")[-1])
    return f"{base}_{name}"


def _genome_of(isdir):
    s2b = isdir.get("scaffold2bin")
    if s2b is None:
        s2l = isdir.get("scaffold2length")
        s2b = {s: "all_scaffolds" for s in s2l}
    return s2b


def _allowed_scaffolds(isdir: ProfileDir, **kwargs) -> Optional[set]:
    """Scaffolds whose genome passes the plot filters, or None for "all"
    (reference: plotting/utilities.py:9-39 plot_genome — an explicit
    --genomes list wins; otherwise genomes below --minimum_breadth at the
    highest mm are skipped)."""
    if "_allowed" in kwargs:  # precomputed once by the controller
        return kwargs["_allowed"]
    s2b = _genome_of(isdir)
    genomes = kwargs.get("genomes")
    if genomes is not None:
        # an explicit list wins, even an empty one (reference
        # plotting/utilities.py:18-23 treats [] as "no genome passes")
        keep = set(genomes)
        return {s for s, b in s2b.items() if b in keep}
    mb = float(kwargs.get("minimum_breadth", 0) or 0)
    if mb <= 0:
        return None
    gdb = isdir.get("genome_level_info")
    if gdb is None or len(gdb) == 0:
        # roll up length-weighted breadth from the scaffold table
        # (reference computes genomeWideFromIS on the fly)
        db = isdir.get("cumulative_scaffold_table")
        if db is None or len(db) == 0:
            return None
        db = db.sort_values("mm").drop_duplicates(
            subset="scaffold", keep="last").copy()
        db["genome"] = db["scaffold"].map(s2b)
        g = db.groupby("genome").apply(
            lambda d: (d["breadth"] * d["length"]).sum() /
            d["length"].sum(), include_groups=False)
        b2b = g.to_dict()
    else:
        if "mm" in gdb.columns:
            gdb = gdb.sort_values("mm").drop_duplicates(subset="genome",
                                                        keep="last")
        b2b = dict(zip(gdb["genome"], gdb["breadth"]))
    keep = {g for g, b in b2b.items() if float(b) >= mb}
    return {s for s, b in s2b.items() if b in keep}


# 1 ---------------------------------------------------------------------

def plot_coverage_breadth_vs_mm(isdir: ProfileDir, **kwargs):
    """Coverage/breadth vs read-pair ANI level (mapping_plots.py)."""
    db = isdir.get("cumulative_scaffold_table")
    if db is None or len(db) == 0:
        raise ValueError("no scaffold table")
    s2b = _genome_of(isdir)
    db = db.copy()
    allowed = _allowed_scaffolds(isdir, **kwargs)
    if allowed is not None:
        db = db[db["scaffold"].isin(allowed)]
    db["genome"] = db["scaffold"].map(s2b)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for genome, gdb in db.groupby("genome"):
        agg = gdb.groupby("mm").apply(
            lambda d: pd.Series({
                "coverage": (d["coverage"] * d["length"]).sum() /
                d["length"].sum(),
                "breadth": (d["breadth"] * d["length"]).sum() /
                d["length"].sum()}), include_groups=False).reset_index()
        axes[0].plot(agg["mm"], agg["coverage"], marker="o", label=genome)
        axes[1].plot(agg["mm"], agg["breadth"], marker="o", label=genome)
    axes[0].set_xlabel("read pair mismatches")
    axes[0].set_ylabel("coverage")
    axes[1].set_xlabel("read pair mismatches")
    axes[1].set_ylabel("breadth")
    if (len(db["genome"].unique()) <= 10 and
            axes[0].get_legend_handles_labels()[1]):
        axes[0].legend(fontsize=6)
    plt.tight_layout()
    plt.savefig(_figpath(isdir, "CoverageAndBreadth_vs_readMismatch.pdf"))
    plt.close(fig)


# 2 ---------------------------------------------------------------------

def plot_genome_wide_microdiversity(isdir: ProfileDir, **kwargs):
    """Windowed coverage / nucleotide diversity / SNV density
    (positional_plots.py)."""
    covT = isdir.get("covT")
    snvs = gen.nonredundant_snv_table(isdir)
    s2l = isdir.get("scaffold2length")
    allowed = _allowed_scaffolds(isdir, **kwargs)
    if allowed is not None:
        covT = {s: v for s, v in covT.items() if s in allowed}
    fig, axes = plt.subplots(3, 1, figsize=(10, 7), sharex=True)
    offset = 0
    window = 1000
    for scaff, mm2cov in covT.items():
        L = int(s2l[scaff])
        cov = np.zeros(L)
        for mm, series in mm2cov.items():
            cov[series.index.values] += series.values
        nwin = max(L // window, 1)
        starts = np.arange(nwin) * window
        wcov = [cov[s:s + window].mean() for s in starts]
        axes[0].plot(offset + starts, wcov, lw=0.7)
        if snvs is not None and len(snvs):
            sdb = snvs[snvs["scaffold"] == scaff]
            dens = np.histogram(sdb["position"], bins=nwin,
                                range=(0, nwin * window))[0] / window
            axes[1].plot(offset + starts, dens, lw=0.7)
        offset += L
    clon = isdir.get("clonT")
    if allowed is not None:
        clon = {s: v for s, v in clon.items() if s in allowed}
    offset = 0
    for scaff, mm2c in clon.items():
        L = int(s2l[scaff])
        vals = pd.Series(dtype=float)
        for mm in sorted(mm2c):
            vals = mm2c[mm].combine_first(vals)
        if len(vals):
            nwin = max(L // window, 1)
            micro = 1 - vals
            w = micro.groupby(micro.index // window).mean()
            axes[2].plot(offset + w.index.values * window, w.values, lw=0.7)
        offset += L
    axes[0].set_ylabel("coverage")
    axes[1].set_ylabel("SNV density")
    axes[2].set_ylabel("nucl diversity")
    axes[2].set_xlabel("genome position")
    plt.tight_layout()
    plt.savefig(_figpath(isdir, "genomeWide_microdiveristy_metrics.pdf"))
    plt.close(fig)


# 3 ---------------------------------------------------------------------

def plot_read_ani_distribution(isdir: ProfileDir, **kwargs):
    """Distribution of read-pair ANI (mapping_plots.py)."""
    rdic = isdir.get("Rdic")
    mapping = isdir.get("mapping_info")
    mean_len = float(mapping["mean_pair_length"].iloc[0])
    mms = []
    allowed = _allowed_scaffolds(isdir, **kwargs)
    if isinstance(rdic, dict):
        for scaff, p2m in rdic.items():
            if allowed is not None and scaff not in allowed:
                continue
            if isinstance(p2m, dict):
                mms.extend(p2m.values())
    if not mms:
        raise ValueError("no mm data (skip_mm_profiling?)")
    anis = 1 - np.array(mms, dtype=float) / mean_len
    fig = plt.figure(figsize=(6, 4))
    plt.hist(anis, bins=100)
    plt.xlabel("read pair ANI")
    plt.ylabel("read pairs")
    plt.tight_layout()
    plt.savefig(_figpath(isdir, "readANI_distribution.pdf"))
    plt.close(fig)


# 4 ---------------------------------------------------------------------

def plot_allele_frequencies(isdir: ProfileDir, **kwargs):
    """Major allele frequency histogram (SNV_plots.py)."""
    db = gen.nonredundant_snv_table(isdir)
    if db is None or len(db) == 0:
        raise ValueError("no SNVs")
    db = db[db["allele_count"] >= 2]
    allowed = _allowed_scaffolds(isdir, **kwargs)
    if allowed is not None:
        db = db[db["scaffold"].isin(allowed)]
    fig = plt.figure(figsize=(6, 4))
    plt.hist(db["var_freq"], bins=50)
    plt.xlabel("minor allele frequency")
    plt.ylabel("SNVs")
    plt.tight_layout()
    plt.savefig(_figpath(isdir, "MajorAllele_frequency_plot.pdf"))
    plt.close(fig)


# 5 ---------------------------------------------------------------------

def plot_linkage_decay(isdir: ProfileDir, **kwargs):
    """r2 / D' vs distance (linkage_plots.py)."""
    db = gen.nonredundant_linkage_table(isdir)
    if db is None or len(db) == 0:
        raise ValueError("no linkage")
    allowed = _allowed_scaffolds(isdir, **kwargs)
    if allowed is not None:
        db = db[db["scaffold"].isin(allowed)]
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    bins = np.arange(0, db["distance"].max() + 50, 50)
    db = db.copy()
    db["bin"] = pd.cut(db["distance"], bins)
    for ax, col in zip(axes, ["r2", "d_prime"]):
        means = db.groupby("bin", observed=True)[col].mean()
        mids = [b.mid for b in means.index]
        ax.plot(mids, means.values, marker="o", ms=3)
        ax.set_xlabel("distance (bp)")
        ax.set_ylabel(col)
    plt.tight_layout()
    plt.savefig(_figpath(isdir, "LinkageDecay_plot.pdf"))
    plt.close(fig)


# 6 ---------------------------------------------------------------------

def plot_read_filtering(isdir: ProfileDir, **kwargs):
    """Read filtering tallies (mapping_plots.py)."""
    db = isdir.get("mapping_info")
    row = db[db["scaffold"] == "all_scaffolds"].iloc[0]
    cols = [c for c in db.columns if c.startswith(("unfiltered_", "pass_",
                                                   "filtered_"))]
    fig = plt.figure(figsize=(7, 4))
    vals = [float(row[c]) for c in cols]
    plt.barh(range(len(cols)), vals)
    plt.yticks(range(len(cols)), cols, fontsize=7)
    plt.xlabel("reads / pairs")
    plt.tight_layout()
    plt.savefig(_figpath(isdir, "ReadFiltering_plot.pdf"))
    plt.close(fig)


# 7 ---------------------------------------------------------------------

def plot_scaffold_inspection(isdir: ProfileDir, **kwargs):
    """Per-scaffold windowed metrics, tall layout (positional_plots.py)."""
    covT = isdir.get("covT")
    s2l = isdir.get("scaffold2length")
    allowed = _allowed_scaffolds(isdir, **kwargs)
    scaffs = [s for s in covT
              if allowed is None or s in allowed]
    if not scaffs:
        raise ValueError("no coverage")
    fig, axes = plt.subplots(max(len(scaffs), 1), 1,
                             figsize=(8, max(2 * len(scaffs), 2)),
                             squeeze=False)
    window = 1000
    for i, scaff in enumerate(scaffs):
        L = int(s2l[scaff])
        cov = np.zeros(L)
        for mm, series in covT[scaff].items():
            cov[series.index.values] += series.values
        nwin = max(L // window, 1)
        starts = np.arange(nwin) * window
        axes[i][0].plot(starts, [cov[s:s + window].mean() for s in starts],
                        lw=0.8)
        axes[i][0].set_ylabel(scaff[:25], fontsize=6)
    plt.tight_layout()
    plt.savefig(_figpath(isdir, "ScaffoldInspection_plot.pdf"))
    plt.close(fig)


# 8 ---------------------------------------------------------------------

def plot_linkage_decay_types(isdir: ProfileDir, **kwargs):
    """Linkage decay split by S/N mutation types (linkage_plots.py).
    Requires gene profiling."""
    db = gen.nonredundant_linkage_table(isdir)
    mdb = isdir.get("SNP_mutation_types")
    if db is None or len(db) == 0 or mdb is None or len(mdb) == 0:
        raise ValueError("needs linkage + genes")
    allowed = _allowed_scaffolds(isdir, **kwargs)
    if allowed is not None:
        db = db[db["scaffold"].isin(allowed)]
    p2t = mdb.set_index(["scaffold", "position"])["mutation_type"].to_dict()
    db = db.copy()
    db["type_A"] = [p2t.get((s, p), "?") for s, p in
                    zip(db["scaffold"], db["position_A"])]
    db["type_B"] = [p2t.get((s, p), "?") for s, p in
                    zip(db["scaffold"], db["position_B"])]
    db["pair_type"] = ["".join(sorted([a, b])) for a, b in
                       zip(db["type_A"], db["type_B"])]
    fig = plt.figure(figsize=(7, 4))
    bins = np.arange(0, db["distance"].max() + 100, 100)
    for ptype, pdb in db.groupby("pair_type"):
        if len(pdb) < 5:
            continue
        binned = pd.cut(pdb["distance"], bins)
        means = pdb.groupby(binned, observed=True)["r2"].mean()
        plt.plot([b.mid for b in means.index], means.values, marker="o",
                 ms=2, label=ptype)
    plt.xlabel("distance (bp)")
    plt.ylabel("r2")
    if plt.gca().get_legend_handles_labels()[1]:
        plt.legend(fontsize=7)
    plt.tight_layout()
    plt.savefig(_figpath(isdir, "LinkageDecay_types_plot.pdf"))
    plt.close(fig)


# 9 ---------------------------------------------------------------------

def plot_gene_histograms(isdir: ProfileDir, **kwargs):
    """Gene-level metric histograms (gene_plots.py). Requires genes."""
    db = gen.generate(isdir, "gene_info", store=False, return_table=True)
    if db is None or len(db) == 0:
        raise ValueError("needs genes")
    allowed = _allowed_scaffolds(isdir, **kwargs)
    if allowed is not None and "scaffold" in db.columns:
        db = db[db["scaffold"].isin(allowed)]
    cols = [c for c in ["coverage", "breadth", "nucl_diversity",
                        "pNpS_variants"] if c in db.columns]
    fig, axes = plt.subplots(1, len(cols), figsize=(3 * len(cols), 3))
    if len(cols) == 1:
        axes = [axes]
    for ax, col in zip(axes, cols):
        vals = db[col].dropna()
        if len(vals):
            ax.hist(vals, bins=30)
        ax.set_xlabel(col)
    plt.tight_layout()
    plt.savefig(_figpath(isdir, "GeneHistogram_plot.pdf"))
    plt.close(fig)


# 10 --------------------------------------------------------------------

def plot_compare_dendrograms(isdir: ProfileDir, **kwargs):
    """popANI/conANI dendrograms from a compare profile
    (compare_plots.py)."""
    import scipy.cluster.hierarchy as sch
    import scipy.spatial.distance as ssd
    db = isdir.get("genomeWide_compare")
    if db is None:
        # compute genome-wide compare table on the fly
        ct = gen.nonredundant_rc_table(isdir)
        if ct is None or len(ct) == 0:
            raise ValueError("needs a compare profile")
        s2b = _genome_of(isdir)
        from ..profile.genome import genome_wide_readcomparer
        ct = ct.copy()
        ct["mm"] = 0
        ct["genome"] = ct["scaffold"].map(s2b)
        b2l = isdir.get("bin2length")
        db = genome_wide_readcomparer(ct, s2b, b2l, mm_level=False)
    names = sorted(set(db["name1"]) | set(db["name2"]))
    genomes = db["genome"].unique()
    fig, axes = plt.subplots(len(genomes), 1,
                             figsize=(6, 3 * len(genomes)), squeeze=False)
    for gi, genome in enumerate(genomes):
        gdb = db[db["genome"] == genome]
        n = len(names)
        dist = np.zeros((n, n))
        for _, row in gdb.iterrows():
            i, j = names.index(row["name1"]), names.index(row["name2"])
            d = 1 - (row["popANI"] if row["popANI"] == row["popANI"] else 0)
            dist[i, j] = dist[j, i] = d
        if n > 1:
            linkage = sch.linkage(ssd.squareform(dist, checks=False),
                                  "average")
            sch.dendrogram(linkage, labels=names, ax=axes[gi][0])
        axes[gi][0].set_title(str(genome), fontsize=8)
    plt.tight_layout()
    plt.savefig(_figpath(isdir, "inStrainCompare_dendrograms.pdf"))
    plt.close(fig)
