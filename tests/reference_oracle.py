"""
Import pure-Python pieces of the reference implementation as test oracles.

The reference tree at /root/reference is read-only public content; we use
its *behavior* (pure functions on in-memory data) to cross-check our
kernels on randomized inputs. Heavy native deps (pysam, Bio, lmfit,
seaborn) are stubbed out — only modules whose tested functions don't touch
them are imported.
"""

import sys
import types

REF_ROOT = "/root/reference"

_STUBS = ["pysam", "Bio", "Bio.Seq", "Bio.SeqIO", "Bio.SeqRecord",
          "Bio.bgzf", "Bio.codonalign", "Bio.codonalign.codonalphabet",
          "lmfit", "drep", "drep.d_cluster", "drep.d_analyze"]


def _install_stubs():
    for name in _STUBS:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "Bio.codonalign.codonalphabet":
                def default_codon_table():
                    return None
                mod.default_codon_table = _biopython_codon_table()
            sys.modules[name] = mod
    # wire up parent attrs
    for name in _STUBS:
        if "." in name:
            parent, child = name.rsplit(".", 1)
            setattr(sys.modules[parent], child, sys.modules[name])


class _CodonTable:
    """Minimal stand-in for Biopython's NCBI standard codon table."""

    def __init__(self):
        bases = "TCAG"
        aas = ("FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRR"
               "IIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG")
        self.forward_table = {}
        self.stop_codons = []
        i = 0
        for b1 in bases:
            for b2 in bases:
                for b3 in bases:
                    aa = aas[i]
                    codon = b1 + b2 + b3
                    if aa == "*":
                        self.stop_codons.append(codon)
                    else:
                        self.forward_table[codon] = aa
                    i += 1


def _biopython_codon_table():
    return _CodonTable()


def import_reference(module: str):
    """
    Import a reference module, e.g. import_reference(
    'inStrain.profile.snv_utilities').
    """
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import importlib
    # The reference module chain mutates matplotlib.rcParams process-wide
    # at import time (e.g. inStrain/plotting/positional_plots.py:10 sets
    # pdf.fonttype=42); snapshot/restore so an oracle import can't poison
    # unrelated tests in the same process.
    try:
        import matplotlib
        saved = matplotlib.rcParams.copy()
    except ImportError:
        saved = None
    try:
        return importlib.import_module(module)
    finally:
        if saved is not None:
            import matplotlib
            # bypass validation: a straight .update() warns on deprecated
            # keys present in the copy
            dict.update(matplotlib.rcParams, saved)
