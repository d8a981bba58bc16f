"""
Scaffold-to-bin (genome) mapping loaders
(reference: inStrain/genomeUtilities.py:851-913).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Union

from . import fasta as fasta_io


def parse_stb(path: str) -> Dict[str, str]:
    stb = {}
    with open(path) as f:
        for line in f:
            words = line.strip().split("\t")
            if len(words) < 2:
                continue
            stb[words[0].strip()] = words[1].strip()
    return stb


def gen_stb(fastas: List[str]) -> Dict[str, str]:
    stb = {}
    for path in fastas:
        bin_name = os.path.basename(path)
        for name in fasta_io.read_fasta(path):
            stb[name.strip()] = bin_name
    if not stb:
        raise ValueError("no scaffolds found in fasta list")
    return stb


def load_scaff2bin(input_stb: Union[List[str], None],
                   s2l: Optional[Dict[str, int]] = None) -> Dict[str, str]:
    """
    Resolve the --stb argument: tsv file, list of fasta files, or nothing
    (-> every scaffold in s2l maps to 'all_scaffolds').
    """
    if not input_stb:
        if s2l is not None:
            return {s: "all_scaffolds" for s in s2l}
        return {}
    # try fasta list first (reference order: gen_stb, then parse_stb)
    try:
        return gen_stb(list(input_stb))
    except Exception:
        pass
    if len(input_stb) == 1:
        return parse_stb(input_stb[0])
    raise ValueError("could not load scaffold-to-bin input")
