"""
User-facing output table generation (reference: SNVprofile.generate,
SNVprofile.py:192-443) with the exact column orders, plus the
non-redundant (highest-mm) views (SNVprofile.py:471-548).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np
import pandas as pd

from .profile_dir import ProfileDir

COLUMN_ORDERS = {
    "SNVs": ["scaffold", "position", "position_coverage", "allele_count",
             "ref_base", "con_base", "var_base",
             "ref_freq", "con_freq", "var_freq",
             "A", "C", "T", "G",
             "gene", "mutation", "mutation_type", "cryptic"],
    "scaffold_info": ["scaffold", "length", "coverage", "breadth",
                      "nucl_diversity",
                      "coverage_median", "coverage_std", "coverage_SEM",
                      "breadth_minCov", "breadth_expected",
                      "nucl_diversity_median",
                      "nucl_diversity_rarefied",
                      "nucl_diversity_rarefied_median",
                      "breadth_rarefied",
                      "conANI_reference", "popANI_reference",
                      "SNS_count", "SNV_count", "divergent_site_count"],
    "linkage": ["scaffold", "position_A", "position_B", "distance",
                "r2", "d_prime",
                "r2_normalized", "d_prime_normalized",
                "allele_A", "allele_a",
                "allele_B", "allele_b",
                "countab", "countAb", "countaB", "countAB", "total"],
    "gene_info": ["scaffold", "gene", "gene_length",
                  "coverage", "breadth", "breadth_minCov", "nucl_diversity",
                  "start", "end", "direction", "partial",
                  "dNdS_substitutions", "pNpS_variants",
                  "SNV_count", "SNV_S_count", "SNV_N_count",
                  "SNS_count", "SNS_S_count", "SNS_N_count",
                  "divergent_site_count"],
    "genome_info": ["genome", "coverage", "breadth", "nucl_diversity",
                    "length", "true_scaffolds", "detected_scaffolds",
                    "coverage_median", "coverage_std", "coverage_SEM",
                    "breadth_minCov", "breadth_expected",
                    "nucl_diversity_rarefied",
                    "conANI_reference", "popANI_reference",
                    "iRep", "iRep_GC_corrected",
                    "linked_SNV_count", "SNV_distance_mean", "r2_mean",
                    "d_prime_mean",
                    "consensus_divergent_sites",
                    "population_divergent_sites",
                    "SNS_count", "SNV_count",
                    "filtered_read_pair_count",
                    "reads_unfiltered_pairs",
                    "reads_mean_PID"],
    "mapping_info": ["scaffold", "pass_pairing_filter", "filtered_pairs"],
    "pairwise_SNP_locations": [
        "mm", "scaffold", "position", "name1", "name2",
        "consensus_SNP", "population_SNP",
        "con_base_1", "ref_base_1", "var_base_1", "position_coverage_1",
        "A_1", "C_1", "T_1", "G_1",
        "con_base_2", "ref_base_2", "var_base_2", "position_coverage_2",
        "A_2", "C_2", "T_2", "G_2"],
    "pooled_SNV_info": ["scaffold", "position", "depth", "A", "C", "T", "G",
                        "ref_base", "con_base", "var_base",
                        "sample_detections", "sample_5x_detections",
                        "DivergentSite_count", "SNS_count", "SNV_count",
                        "con_SNV_count", "pop_SNV_count"],
}


def reorder_columns(db: pd.DataFrame, order) -> pd.DataFrame:
    if db is None or len(db) == 0:
        return db
    cols = [c for c in order if c in db.columns]
    extra = [c for c in db.columns if c not in order]
    return db[cols + extra]


# ---------- non-redundant views ----------

def nonredundant(db: Optional[pd.DataFrame], subset,
                 drop_cryptic: bool = False) -> pd.DataFrame:
    """sort by mm, keep the highest-mm row per key
    (reference: SNVprofile.py:471-522)."""
    if db is None or len(db) == 0:
        return pd.DataFrame()
    if drop_cryptic and "cryptic" in db:
        db = db[db["cryptic"] == False]  # noqa: E712
    return (db.sort_values("mm")
              .drop_duplicates(subset=subset, keep="last")
              .sort_index().drop(columns=["mm"]))


def nonredundant_snv_table(isdir: ProfileDir) -> pd.DataFrame:
    return nonredundant(isdir.get("cumulative_snv_table"),
                        ["scaffold", "position"], drop_cryptic=True)


def nonredundant_scaffold_table(isdir: ProfileDir) -> pd.DataFrame:
    return nonredundant(isdir.get("cumulative_scaffold_table"), ["scaffold"])


def nonredundant_linkage_table(isdir: ProfileDir) -> pd.DataFrame:
    return nonredundant(isdir.get("raw_linkage_table"),
                        ["scaffold", "position_A", "position_B"])


def nonredundant_rc_table(isdir: ProfileDir) -> pd.DataFrame:
    return nonredundant(isdir.get("comparisonsTable"),
                        ["scaffold", "name1", "name2"])


# ---------- generate ----------

def generate(isdir: ProfileDir, name: str, store: bool = True,
             return_table: bool = False, **kwargs):
    """Write <output>/<base>_<name>.tsv in the reference's schema."""
    report_mm_level = kwargs.get("mm_level", False)
    force_compress = kwargs.get("force_compress", False)
    db = None

    if name == "SNVs":
        db = nonredundant_snv_table(isdir)
        mdb = isdir.get("SNP_mutation_types")
        if mdb is not None and len(mdb) > 0 and len(db) > 0:
            mdb = mdb[["scaffold", "position", "mutation_type", "mutation",
                       "gene"]]
            db = pd.merge(db, mdb, how="left", on=["scaffold", "position"])
        db = reorder_columns(db, COLUMN_ORDERS["SNVs"])

    elif name == "scaffold_info":
        db = reorder_columns(nonredundant_scaffold_table(isdir),
                             COLUMN_ORDERS["scaffold_info"])

    elif name == "linkage":
        db = reorder_columns(nonredundant_linkage_table(isdir),
                             COLUMN_ORDERS["linkage"])

    elif name == "gene_info":
        gdb = isdir.get("genes_table")
        if gdb is None:
            logging.info("Cannot generate genes_table; no genes profiled")
            return None
        for thing in ["genes_coverage", "genes_clonality", "genes_SNP_count"]:
            db2 = isdir.get(thing)
            if db2 is None or len(db2) == 0:
                continue
            db2 = db2.sort_values("mm").drop_duplicates(subset=["gene"],
                                                        keep="last")
            del db2["mm"]
            gdb = pd.merge(gdb, db2, on="gene", how="left")
        for c in ["N_sites", "S_sites"]:
            if c in gdb.columns:
                del gdb[c]
        db = reorder_columns(gdb, COLUMN_ORDERS["gene_info"])
        if db is not None and len(db) > 0 and "coverage" in db:
            db = db[db["coverage"] > 0]

    elif name == "genome_info":
        db = isdir.get("genome_level_info")
        db = reorder_columns(db, COLUMN_ORDERS["genome_info"])
        if db is not None:
            read_cols = [c for c in db.columns if c.startswith("reads_")]
            keep = [c for c in read_cols if c in
                    ["reads_unfiltered_reads", "reads_unfiltered_pairs",
                     "reads_mean_PID"]]
            for c in set(read_cols) - set(keep):
                del db[c]
            if not report_mm_level and "mm" in db.columns:
                db = (db.sort_values("mm")
                        .drop_duplicates(subset=["genome"], keep="last")
                        .sort_values("genome"))
                del db["mm"]

    elif name == "mapping_info":
        from ..profile.filter_reads import write_mapping_info
        db = isdir.get("mapping_info")
        values = isdir.get("mapping_info_values")
        if not values:
            # profiles written by other tools: reconstruct the header from
            # reference defaults (filter_reads.write_mapping_info semantics)
            values = {"min_read_ani": 0.95, "max_insert_relative": 3,
                      "min_insert": 50, "min_mapq": -1,
                      "pairing_filter": "paired_only"}
        if store and db is not None:
            ft = ".tsv.gz" if force_compress else ".tsv"
            location = isdir.get_output_base() + name + ft
            if os.path.exists(location):
                os.remove(location)
            write_mapping_info(
                reorder_columns(db, COLUMN_ORDERS["mapping_info"]),
                location, values)
        return db if return_table else None

    elif name == "comparisonsTable":
        db = nonredundant_rc_table(isdir)

    elif name == "pairwise_SNP_locations":
        db = isdir.get("pairwise_SNP_locations")
        db = reorder_columns(db, COLUMN_ORDERS["pairwise_SNP_locations"])
        if db is not None and not report_mm_level and len(db) > 0:
            db = (db.sort_values("mm")
                    .drop_duplicates(subset=["scaffold", "position",
                                             "name1", "name2"], keep="last")
                    .sort_index().drop(columns=["mm"]))

    elif name == "pooled_SNV_info":
        db = isdir.get("PMdb")
        if db is not None:
            # PMdb's (unnamed) index IS the position; a plain
            # reset_index() would emit a column literally named 'index'
            # (reference: SNVprofile.py:373-375 assigns it explicitly)
            db["position"] = db.index
            db = db.reset_index(drop=True)
            db = reorder_columns(db, COLUMN_ORDERS["pooled_SNV_info"])

    elif name == "pooled_SNV_data":
        return _generate_pooled_data(isdir, store, return_table,
                                     force_compress)

    else:
        raise ValueError(f"do not know how to generate {name}")

    if db is None:
        logging.info(f"Could not create {name}")
        return None

    if store:
        ft = ".tsv.gz" if (len(db) > 1e6 or force_compress) else ".tsv"
        db.to_csv(isdir.get_output_base() + name + ft, index=False, sep="\t")
    if return_table:
        return db


def _generate_pooled_data(isdir: ProfileDir, store, return_table,
                          force_compress):
    """pooled_SNV_data + keys table (reference: SNVprofile.py:377-421)."""
    from collections import defaultdict
    DSTdb = isdir.get("DSTdb")
    if DSTdb is None:
        return None
    sa2k = {s: i for i, s in enumerate(set(DSTdb.index.get_level_values(0)))}
    sc2k = {s: i for i, s in enumerate(set(DSTdb["scaffold"]))}
    db = DSTdb.copy()
    db["sample"] = [sa2k[s] for s in DSTdb.index.get_level_values(0)]
    db["scaffold"] = db["scaffold"].map(sc2k).astype(int)
    db["position"] = DSTdb.index.get_level_values(1).astype(int)
    db = db.reset_index(drop=True)
    db = db[["sample", "scaffold", "position", "A", "C", "T", "G"]]

    table = defaultdict(list)
    k2sa = {v: k for k, v in sa2k.items()}
    k2sc = {v: k for k, v in sc2k.items()}
    for i in sorted(set(k2sa) | set(k2sc)):
        table["key"].append(i)
        table["sample"].append(k2sa.get(i, np.nan))
        table["scaffold"].append(k2sc.get(i, np.nan))
    kdb = pd.DataFrame(table)
    if store:
        ft = ".tsv.gz" if (len(kdb) > 1e6 or force_compress) else ".tsv"
        kdb.to_csv(isdir.get_output_base() + "pooled_SNV_data_keys" + ft,
                   index=False, sep="\t")
        ft = ".tsv.gz" if (len(db) > 1e6 or force_compress) else ".tsv"
        db.to_csv(isdir.get_output_base() + "pooled_SNV_data" + ft,
                  index=False, sep="\t")
    if return_table:
        return db
