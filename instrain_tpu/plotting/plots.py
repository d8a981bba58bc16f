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

_METRIC_ORDER = ["linkage", "snp_density", "coverage", "nucl_diversity"]


def _genome_pages(isdir: ProfileDir, **kwargs):
    """Yield (genome, Wdb, breaks, midpoints) per plottable genome
    (reference: positional_plots.py:21-68 — one PDF page per genome,
    windowed metrics over its scaffolds, longest first)."""
    from collections import defaultdict
    from .windowed import load_windowed_metrics
    s2b = _genome_of(isdir)
    b2s = defaultdict(list)
    for s, b in s2b.items():
        b2s[b].append(s)
    covT = isdir.get("covT")
    clonT = isdir.get("clonT")
    ldb = isdir.get("raw_linkage_table")
    sdb = isdir.get("cumulative_snv_table")
    s2l = isdir.get("scaffold2length")
    rl = isdir.get_read_length()
    allowed = _allowed_scaffolds(isdir, **kwargs)
    for genome, scaffolds in b2s.items():
        present = [s for s in scaffolds if s in s2l]
        if allowed is not None:
            present = [s for s in present if s in allowed]
        if not present:
            continue
        Wdb, breaks, midpoints = load_windowed_metrics(
            present, s2l, rl, covTs=covT, clonTs=clonT,
            raw_linkage_table=ldb, cumulative_snv_table=sdb)
        if len(Wdb) == 0 or Wdb["value"].notna().sum() == 0:
            continue
        yield genome, Wdb, breaks, midpoints


def _save_pages(figs, path):
    from matplotlib.backends.backend_pdf import PdfPages
    if not figs:
        raise ValueError("no genome had windowed metrics to plot")
    with PdfPages(path) as pp:
        for fig in figs:
            pp.savefig(fig)
            plt.close(fig)


def plot_genome_wide_microdiversity(isdir: ProfileDir, **kwargs):
    """Per-genome windowed linkage / SNV density / coverage / diversity,
    one page per genome, two read-ANI levels per panel
    (positional_plots.py:21-83, 140-183)."""
    figs = []
    for genome, Wdb, breaks, _mid in _genome_pages(isdir, **kwargs):
        present = [m for m in _METRIC_ORDER
                   if m in set(Wdb["metric"])]
        fig, axes = plt.subplots(len(present), 1, sharex=True,
                                 squeeze=False, figsize=(8, 5))
        colors = ["red", "blue", "black"]
        for i, metric in enumerate(present):
            ax = axes[i][0]
            wdb = Wdb[Wdb["metric"] == metric]
            for c, (ani, ddb) in enumerate(wdb.groupby("ANI")):
                ax.plot(ddb["midpoint"], ddb["value"],
                        c=colors[c % 3], label=ani, marker="o", ms=1)
            ax.set_title(str(metric))
            ax.grid(False)
            if i == 0:
                ax.legend(loc="upper left", title="Min read ANI (%)",
                          fontsize=7)
            for b in breaks:
                ax.axvline(b, ls="-", c="lightgrey", zorder=-1)
        axes[-1][0].set_xlabel("genome position")
        axes[-1][0].set_xlim(0, float(Wdb["midpoint"].max()))
        fig.suptitle(str(genome), y=0.999)
        fig.subplots_adjust(hspace=0.3)
        fig.tight_layout()
        figs.append(fig)
    _save_pages(figs, _figpath(isdir,
                               "genomeWide_microdiveristy_metrics.pdf"))


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
    """Per-genome scaffold inspection: the same four windowed metrics as
    plot 2 rotated sideways — genome position on y (inverted), one column
    per metric, scaffold names as y-ticks at their midpoints, page height
    scaled to genome length (positional_plots.py:85-138, 510-569)."""
    figs = []
    for genome, Wdb, breaks, midpoints in _genome_pages(isdir, **kwargs):
        present = [m for m in _METRIC_ORDER
                   if m in set(Wdb["metric"])]
        ymax = float(Wdb["midpoint"].max())
        # reference utilities._calc_ylim:49-50
        height = min(max(5.0, ymax / 5000.0), 100.0)
        fig, axes = plt.subplots(1, len(present), sharey=True,
                                 squeeze=False, figsize=(8, height))
        colors = ["red", "blue", "black"]
        for i, metric in enumerate(present):
            ax = axes[0][i]
            wdb = Wdb[Wdb["metric"] == metric]
            for c, (ani, ddb) in enumerate(wdb.groupby("ANI")):
                ax.plot(ddb["value"], ddb["midpoint"],
                        c=colors[c % 3], label=ani, marker="o", ms=5)
            ax.set_title(str(metric))
            ax.yaxis.grid(False)
            if i == 0:
                ax.legend(loc="upper left", title="Min read ANI (%)",
                          fontsize=7)
            for b in breaks:
                ax.axhline(b, ls="-", c="lightgrey", zorder=-1)
        axes[0][0].set_yticks(list(midpoints.values()))
        axes[0][0].set_yticklabels(list(midpoints.keys()), fontsize=2)
        axes[0][0].set_ylim(ymax, 0)
        fig.suptitle(str(genome), y=0.999)
        fig.subplots_adjust(hspace=0.3)
        fig.tight_layout()
        figs.append(fig)
    _save_pages(figs, _figpath(isdir, "ScaffoldInspection_plot.pdf"))


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

def _shorten_sample(name: str) -> str:
    """reference: plotting/utilities.py:52-58 _shorten_name."""
    name = str(name).replace(".sorted.bam", "")
    if "-vs-" in name:
        name = name.split("-vs-")[1]
    if len(name) > 15:
        name = "\n".join(name[n:n + 15] for n in range(0, len(name), 15))
    return name


def _symmetric_matrix(gdb: pd.DataFrame, col: str) -> pd.DataFrame:
    """Square sample-by-sample similarity matrix from directed rows:
    cell = nanmean of the two directions, diagonal = 1
    (reference: compare_plots.py:120-154 add_av_RC)."""
    samples = sorted(set(gdb["name1"]) | set(gdb["name2"]))
    m = pd.DataFrame(np.nan, index=samples, columns=samples, dtype=float)
    for n1, n2, v in zip(gdb["name1"], gdb["name2"], gdb[col]):
        m.loc[n1, n2] = v
    arr = m.values
    with np.errstate(invalid="ignore"):
        sym = np.nanmean(np.stack([arr, arr.T]), axis=0)
    np.fill_diagonal(sym, 1.0)
    return pd.DataFrame(sym, index=samples, columns=samples)


def plot_compare_dendrograms(isdir: ProfileDir, **kwargs):
    """Per-genome page with two right-oriented dendrograms — popANI and
    shared-genome coverage — labels colored by ANI cluster, x ticks
    relabeled as percent identity (compare_plots.py:27-119)."""
    import scipy.cluster.hierarchy as sch
    import scipy.spatial.distance as ssd
    ct = isdir.get("comparisonsTable")
    if ct is None or len(ct) == 0:
        raise ValueError("needs a compare profile")
    s2b = _genome_of(isdir)
    from ..profile.genome import genome_wide_readcomparer
    ct = ct.copy()
    if "mm" not in ct.columns:
        ct["mm"] = 0
    ct["genome"] = ct["scaffold"].map(s2b)
    b2l = isdir.get("bin2length")
    db = genome_wide_readcomparer(ct, s2b, b2l, mm_level=False)
    db["name1"] = [_shorten_sample(x) for x in db["name1"]]
    db["name2"] = [_shorten_sample(x) for x in db["name2"]]
    db = db.sort_values(["genome", "name1", "name2"])
    if len(db) == 0:
        raise ValueError("empty genome-wide compare table")

    figs = []
    for genome, gdb in db.groupby("genome"):
        # skip genomes with zero-overlap comparisons
        # (reference: compare_utils.py:257-268 evalute_genome_dist_matrix)
        if (gdb["compared_bases_count"] == 0).any():
            logging.error(
                f"Cannot cluster genome {genome}; comparisons with no "
                "genomic overlap")
            continue
        panels = [("popANI", "Average Nucleotide Identity (ANI)"),
                  ("coverage_overlap", "Shared Genome Coverage (%)")]
        fig, axes = plt.subplots(1, 2, gridspec_kw={"wspace": 0.5})
        name2color = None
        for ax, (col, xlabel) in zip(axes, panels):
            m = _symmetric_matrix(gdb, col)
            names = list(m.columns)
            dist = 1.0 - m.values
            np.fill_diagonal(dist, 0.0)
            condensed = ssd.squareform(dist, checks=False)
            linkage = sch.linkage(condensed, method="average")
            if col == "popANI":
                # color labels by 0.1%-ANI cluster (compare_plots.py:94-101)
                fclust = sch.fcluster(linkage, 0.001,
                                      criterion="distance")
                nclust = max(fclust)
                cmap = plt.get_cmap("jet")
                name2color = {n: cmap(int(c) / max(nclust, 1))
                              for n, c in zip(names, fclust)}
            plt.sca(ax)
            sch.dendrogram(linkage, labels=names, orientation="right")
            for lbl in ax.get_ymajorticklabels():
                if name2color:
                    lbl.set_color(name2color.get(lbl.get_text(), "black"))
            ax.set_xlabel(xlabel)
            ax.set_title(str(genome), fontsize=10)
            ax.tick_params(axis="x", which="major", labelsize=8)
            ax.tick_params(axis="y", which="major", labelsize=12)
            ax.yaxis.grid(False)
            # relabel distances as percent identity/overlap
            # (compare_plots.py:110-118)
            locs = ax.xaxis.get_majorticklocs()
            ax.set_xticks(locs)
            ax.set_xticklabels([round((1 - float(x)) * 100, 3)
                                for x in locs])
        n = len(set(gdb["name1"]) | set(gdb["name2"]))
        # reference utilities._x_fig_size(n, factor=.5)
        fig.set_size_inches(20, max(n * 0.5, 8))
        fig.subplots_adjust(left=0.5)
        figs.append(fig)
    _save_pages(figs, _figpath(isdir, "inStrainCompare_dendrograms.pdf"))
