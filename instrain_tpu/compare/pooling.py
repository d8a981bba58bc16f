"""
Cross-sample SNV pooling (reference: inStrain/polymorpher.py).

For every SNV position called in any sample, extract base counts at that
position from every sample's BAM (for samples that didn't call it
themselves), producing the dense per-sample x position count table (DSTdb)
and the per-position summary table (PMdb).

The BAM re-extraction uses the same decode path as profiling — counts are
the cumulative (all-mm) filtered-pair counts at each position.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

from ..io.bam import decode_bam

P2C = {"A": 0, "C": 1, "T": 2, "G": 3}
C2P = "ACTG"


def run_pooling(SCs, name2bam: Dict[str, str], null_lut, freq_lut
                ) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """reference: PoolController.main (polymorpher.py:85-142)."""
    # Load (deduped, non-cryptic) SNP tables per sample
    name2snp: Dict[str, pd.DataFrame] = {}
    name2scaffs: Dict[str, List[str]] = defaultdict(list)
    name2prof = {}
    for sc in SCs:
        for prof, name in zip(sc.profiles, sc.names):
            name2scaffs[name].append(sc.scaffold)
            if name in name2snp:
                continue
            db = prof.get("cumulative_snv_table")
            db = db.rename(columns={
                "conBase": "con_base", "refBase": "ref_base",
                "varBase": "var_base", "baseCoverage": "position_coverage"})
            if "cryptic" in db:
                db = db[db["cryptic"] == False]  # noqa: E712
            db["scaffold"] = db["scaffold"].astype(str)
            if "mm" in db.columns:
                db = (db.sort_values("mm")
                        .drop_duplicates(subset=["scaffold", "position"],
                                         keep="last")
                        .sort_index().drop(columns=["mm"]))
            name2snp[name] = db
            name2prof[name] = prof

    # union of SNV positions per scaffold; per sample, the positions it
    # didn't call itself (extract_SNV_positions, polymorpher.py:318-375)
    scaff2all: Dict[str, set] = {}
    for name, ssdb in name2snp.items():
        for scaff, sdb in ssdb.groupby("scaffold"):
            if scaff not in name2scaffs[name]:
                continue
            scaff2all.setdefault(scaff, set()).update(sdb["position"])
    name2scaff2locs: Dict[str, Dict[str, set]] = {}
    for name, ssdb in name2snp.items():
        d = name2scaff2locs.setdefault(name, {})
        for scaff in name2scaffs[name]:
            if scaff not in scaff2all:
                continue
            called = set(ssdb[ssdb["scaffold"] == scaff]["position"])
            locs = scaff2all[scaff] - called
            d[scaff] = locs

    # pull counts from BAMs
    scaff2name2position2counts: Dict[str, Dict[str, Dict[int, np.ndarray]]]\
        = defaultdict(dict)
    for name, scaff2locs in name2scaff2locs.items():
        bam_loc = name2bam[name]
        rdic = name2prof[name].get("Rdic")
        counts = extract_snvs_from_bam(bam_loc, rdic, scaff2locs)
        for scaff, p2c in counts.items():
            scaff2name2position2counts[scaff][name] = p2c

    dst = _pooled_snv_table(name2snp, name2scaffs,
                            scaff2name2position2counts, scaff2all)
    pmdb = _pooled_summary_table(dst, name2snp, name2scaffs)
    return dst, pmdb


def extract_snvs_from_bam(bam_loc: str, rdic, scaff2locs
                          ) -> Dict[str, Dict[int, np.ndarray]]:
    """Counts of filtered-pair bases at requested positions
    (reference: extract_SNVS_from_bam, polymorpher.py:275-310 — a single
    indexed pass over the needed span per sample). With a .bai present,
    only the requested scaffolds' BGZF blocks are inflated/parsed
    (io.bam decode ranged path); full decode otherwise."""
    bam = decode_bam(bam_loc, baq=False, scaffolds=sorted(scaff2locs))
    name_to_rid = bam.name_to_ref_id
    qname_to_id = {n: i for i, n in enumerate(bam.qnames)}
    out: Dict[str, Dict[int, np.ndarray]] = {}
    for scaff, locs in scaff2locs.items():
        out[scaff] = {int(p): np.zeros(4, dtype=int) for p in locs}
        if not locs or scaff not in name_to_rid:
            continue
        rid = name_to_rid[scaff]
        r2m = rdic.get(scaff, {}) if rdic else {}
        # r2m is {qname: mm} or a set of qnames (skip_mm profiles) —
        # either way iteration yields the allowed qnames
        allowed = [qname_to_id[q] for q in r2m if q in qname_to_id]
        if not allowed:
            continue
        # native masked event selection (bd_select_events): same
        # qual>=30 / ACTG / position-mask / allowed-pair semantics as
        # the profile pileup, without a per-event Python loop (bulk
        # per-event work must not run in the interpreter on this
        # throttled host)
        n_q = bam.n_qnames or int(bam.qname_id.max()) + 1
        qid2mmidx = np.full(n_q, -1, dtype=np.int32)
        qid2mmidx[np.asarray(allowed, dtype=np.int64)] = 0
        L = int(bam.ref_lens[rid])
        mask = np.zeros(L, np.uint8)
        locs_arr = np.fromiter((int(p) for p in locs), dtype=np.int64,
                               count=len(locs))
        mask[locs_arr[(locs_arr >= 0) & (locs_arr < L)]] = 1
        pos, base, _mm, _qn = bam.select_events(rid, qid2mmidx, mask)
        if len(pos):
            key = pos.astype(np.int64) * 4 + base
            uniq, cnt = np.unique(key, return_counts=True)
            for k, c in zip(uniq.tolist(), cnt.tolist()):
                out[scaff][k // 4][k % 4] += c
    return out


def _pooled_snv_table(name2snp, name2scaffs, scaff2name2position2counts,
                      scaff2all) -> pd.DataFrame:
    """reference: genreate_pooled_SNV_table (397-448)."""
    ddsts = []
    order = []
    for scaff, name2position2counts in scaff2name2position2counts.items():
        dbs, names = [], []
        order.append(scaff)
        for name, ori in name2snp.items():
            if scaff not in name2scaffs[name]:
                continue
            p2c = name2position2counts.get(name, {})
            db = pd.DataFrame.from_dict(p2c, orient="index",
                                        columns=["A", "C", "T", "G"])
            ori_s = ori[ori["scaffold"] == scaff]
            if len(ori_s) > 0:
                sdb = pd.concat([db, ori_s[["position", "A", "C", "T",
                                            "G"]].set_index("position")]
                                ).sort_index()
            else:
                sdb = db.sort_index()
            assert set(sdb.index) == set(scaff2all[scaff]), scaff
            dbs.append(sdb)
            names.append(name)
        ddst = pd.concat(dbs, keys=names)
        ddst["scaffold"] = scaff
        ddsts.append(ddst)
    if not ddsts:
        return pd.DataFrame()
    return pd.concat(ddsts)


def _pooled_summary_table(dst, name2snp, name2scaffs) -> pd.DataFrame:
    """reference: generate_pooled_SNV_summary_table (471-551)."""
    if len(dst) == 0:
        return pd.DataFrame()
    mdbs = []
    for scaff, ddst in dst.groupby("scaffold"):
        cdb = pd.concat([t[t["scaffold"] == scaff]
                         for name, t in name2snp.items()
                         if scaff in name2scaffs[name]])
        bdb = (cdb[["position", "ref_base"]].drop_duplicates()
               .set_index("position").sort_index())

        class_options = ["DivergentSite", "SNS", "SNV", "con_SNV", "pop_SNV"]
        ccdb = (cdb.groupby("position")["class"].value_counts()
                .to_frame().rename(columns={"class": "count",
                                            "count": "count"})
                .reset_index()
                .pivot(index="position", columns="class", values="count")
                .fillna(0).reset_index())
        for c in class_options:
            if c not in ccdb.columns:
                ccdb[c] = 0
        ccdb = ccdb[["position"] + class_options].astype(
            {c: int for c in class_options})
        ccdb = ccdb.rename(columns={c: c + "_count" for c in class_options})
        ccdb = ccdb.set_index("position")

        vdb = (cdb.groupby("position")["con_base"].unique().to_frame()
               .rename(columns={"con_base": "sample_con_bases"}))
        vdb["sample_con_bases"] = vdb["sample_con_bases"].astype(str)

        rows, idx = [], []
        for position, pdb in ddst.groupby(level=1):
            rows.append(pdb[["A", "C", "T", "G"]].sum(axis=0))
            idx.append(position)
        ddb = pd.DataFrame(rows, index=pd.Index(idx))
        ddb["scaffold"] = scaff
        ddb["depth"] = ddb[["A", "C", "T", "G"]].sum(axis=1)

        tot = ddst[["A", "C", "T", "G"]].sum(axis=1)
        x5 = (ddst[tot >= 5].groupby(level=1)["A"].count().to_frame()
              .rename(columns={"A": "sample_5x_detections"}))
        xd = (ddst[(ddst[["A", "C", "T", "G"]] > 0).any(axis=1)]
              .groupby(level=1)["A"].count().to_frame()
              .rename(columns={"A": "sample_detections"}))
        dedb = pd.merge(x5, xd, left_index=True, right_index=True)

        mdb = (pd.merge(ddb, bdb, left_index=True, right_index=True)
               .join(dedb).join(ccdb).join(vdb)
               .astype({"A": int, "C": int, "T": int, "G": int,
                        "depth": int, "sample_detections": int})
               .sort_index())
        mdb["con_base"] = [C2P[int(np.argmax([r["A"], r["C"], r["T"],
                                              r["G"]]))]
                           for _, r in mdb.iterrows()]
        var = []
        for _, r in mdb.iterrows():
            counts = [r["A"], r["C"], r["T"], r["G"]]
            counts[P2C[r["con_base"]]] = 0
            var.append(C2P[counts.index(sorted(counts)[-1])])
        mdb["var_base"] = var
        mdbs.append(mdb)
    pmdb = pd.concat(mdbs)
    int_cols = {"A": int, "C": int, "T": int, "G": int, "depth": int,
                "sample_detections": int, "DivergentSite_count": int,
                "SNS_count": int, "SNV_count": int, "con_SNV_count": int,
                "pop_SNV_count": int, "sample_5x_detections": int}
    return pmdb.astype({k: v for k, v in int_cols.items()
                        if k in pmdb.columns})
