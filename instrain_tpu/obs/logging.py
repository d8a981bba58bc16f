"""
Observability: checkpoint/worker logging and runtime reports
(reference: inStrain/logUtils.py — log_checkpoint 904-938, get_worker_log
939-1012, load_log 85-238, report_run_stats 25-83).

The log grammar is kept compatible so `other --run_statistics` style
parsing works on either implementation's logs:
  "Checkpoint <class> <name> <start|end> <RAM> <time>"
  "WorkerLog <class> <unit> <start|end> <time> <PID> <RAM>"
  "FAILURE <type> <unit> ..."
"""

from __future__ import annotations

import logging
import os
import sys
import time
from collections import defaultdict
from typing import Optional

import pandas as pd

try:
    import psutil
except ImportError:  # psutil is expected in the image, but stay safe
    psutil = None


def _ram() -> int:
    if psutil is None:
        return 0
    try:
        process = psutil.Process(os.getpid())
        mem = process.memory_info().rss
        for child in process.children(recursive=True):
            mem += child.memory_info().rss
        return mem
    except Exception:
        return 0


def log_checkpoint(klass: str, name: str, status: str):
    """reference: logUtils.log_checkpoint (904-938)."""
    assert status in ("start", "end"), status
    logging.debug(f"Checkpoint {klass} {name} {status} {_ram()} "
                  f"{time.time()}")


def get_worker_log(klass: str, unit, status: str) -> str:
    """reference: logUtils.get_worker_log (939-976)."""
    assert status in ("start", "end"), status
    return (f"\nWorkerLog {klass} {unit} {status} {time.time()} "
            f"{os.getpid()} {_ram()}")


def log_failure(failure_type: str, unit: str, detail: str = ""):
    """Structured failure line; run continues (reference: per-worker
    try/except FAILURE logging, e.g. profile_utilities.py:92-112)."""
    t = time.strftime("%m-%d %H:%M")
    logging.debug(f"{t} DEBUG FAILURE {failure_type} {unit} {detail}")


def setup_logger(loc: str):
    """DEBUG -> file, INFO -> console (reference: controller.py:445-475)."""
    if logging.getLogger("").handlers:
        return
    logging.basicConfig(level=logging.DEBUG,
                        format="%(asctime)s %(levelname)-8s %(message)s",
                        datefmt="%y-%m-%d %H:%M:%S", filename=loc)
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(logging.Formatter("%(message)s"))
    logging.getLogger("").addHandler(console)
    logging.debug("!" * 80)
    logging.debug(f"***Logger started up at {loc}***")
    logging.debug("Command was: {0}\n".format(" ".join(sys.argv)))


def load_log(logloc: str) -> pd.DataFrame:
    """Parse checkpoint/worker/failure lines back into a table
    (reference: logUtils.load_log 85-238, simplified schema)."""
    table = defaultdict(list)
    with open(logloc) as f:
        for line in f:
            parts = line.strip().split()
            for marker, kind in (("Checkpoint", "checkpoint"),
                                 ("WorkerLog", "worker"),
                                 ("FAILURE", "failure")):
                if marker in parts:
                    i = parts.index(marker)
                    rest = parts[i + 1:]
                    table["log_type"].append(kind)
                    table["class"].append(rest[0] if rest else "")
                    table["name"].append(rest[1] if len(rest) > 1 else "")
                    table["status"].append(rest[2] if len(rest) > 2 else "")
                    table["rest"].append(" ".join(rest[3:]))
                    break
    return pd.DataFrame(table)


def report_run_stats(logloc: str, printToo: bool = True,
                     output: Optional[str] = None) -> str:
    """Runtime/failure summary from a log file (reference:
    logUtils.report_run_stats / generate_reports, simplified)."""
    try:
        ldb = load_log(logloc)
    except FileNotFoundError:
        return "No log found"
    lines = ["..:: Run report ::.."]
    if len(ldb):
        cps = ldb[ldb.log_type == "checkpoint"]
        for (klass, name), db in cps.groupby(["class", "name"]):
            starts = db[db.status == "start"]["rest"]
            ends = db[db.status == "end"]["rest"]
            if len(starts) and len(ends):
                try:
                    t0 = float(starts.iloc[0].split()[-1])
                    t1 = float(ends.iloc[-1].split()[-1])
                    lines.append(f"{klass:20s} {name:30s} "
                                 f"{t1 - t0:10.1f}s")
                except (ValueError, IndexError):
                    pass
        # per-worker-class report (reference: gen_multiprocessing_report
        # / gen_multiprocessing_text, logUtils.py:425-585)
        wdb = ldb[ldb.log_type == "worker"]
        for klass, db in wdb.groupby("class"):
            durs, rams = [], []
            for unit, udb in db.groupby("name"):
                try:
                    s = udb[udb.status == "start"]["rest"].iloc[0].split()
                    e = udb[udb.status == "end"]["rest"].iloc[-1].split()
                    durs.append((float(e[0]) - float(s[0]), unit))
                    rams.append(int(e[2]) - int(s[2]))
                except (ValueError, IndexError):
                    continue
            if not durs:
                continue
            ds = sorted(d for d, _ in durs)
            n = len(ds)
            lines.append(
                f"\n{klass}: {n} units; total {sum(ds):.1f}s; "
                f"mean {sum(ds) / n:.2f}s; median {ds[n // 2]:.2f}s; "
                f"max {ds[-1]:.2f}s")
            worst = sorted(durs, reverse=True)[:3]
            lines.append("  slowest: " + ", ".join(
                f"{u} ({d:.2f}s)" for d, u in worst))
            if rams:
                lines.append(f"  RAM use increase: "
                             f"{humanbytes(sum(rams) / len(rams))} "
                             f"mean per unit")

        fails = ldb[ldb.log_type == "failure"]
        if len(fails):
            lines.append(f"\n{len(fails)} FAILURES:")
            for _, row in fails.iterrows():
                lines.append(f"  {row['class']} {row['name']}")
        else:
            lines.append("\nNo failures")
    report = "\n".join(lines)
    if printToo:
        print(report)
    if output:
        with open(output, "w") as f:
            f.write(report + "\n")
    return report


def humanbytes(B: float) -> str:
    """Bytes -> human string (reference: logUtils.humanbytes 846-871)."""
    B = float(B)
    sign = "-" if B < 0 else ""
    B = abs(B)
    KB, MB, GB, TB = 1024, 1024 ** 2, 1024 ** 3, 1024 ** 4
    if B < KB:
        return f"{sign}{B:.0f} B"
    if B < MB:
        return f"{sign}{B / KB:.2f} KB"
    if B < GB:
        return f"{sign}{B / MB:.2f} MB"
    if B < TB:
        return f"{sign}{B / GB:.2f} GB"
    return f"{sign}{B / TB:.2f} TB"
