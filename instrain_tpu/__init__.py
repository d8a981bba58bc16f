"""
instrain_tpu — a TPU-native strain-profiling framework.

Computes strain-level metrics from metagenomic read mappings: given a sorted
BAM mapped to a FASTA of scaffolds it produces per-scaffold / gene / genome
pileup base counts, coverage/breadth, clonality (nucleotide diversity),
SNV/SNS calls against a sequencing-error null model, SNV linkage
disequilibrium, gene-level dN/dS & pN/pS, genome-wide aggregation (incl.
iRep), and profile-vs-profile comparison (conANI/popANI, strain clustering,
SNV pooling).

Feature-level reference: MrOlm/inStrain v1.9.1 (see SURVEY.md). The
architecture here is designed TPU-first: a native C++ BAM decoder emits
packed read tensors, pileups and site statistics run as JAX/XLA/Pallas
kernels over position-major count arrays, and scaffolds shard across a
`jax.sharding.Mesh` for multi-chip execution.
"""

__version__ = "0.1.0"

# Version of the reference whose capabilities / output schema we match
# (inStrain/_version.py in the reference tree).
__capability_version__ = "1.9.1"

# 64-bit types: the compact device kernels accumulate integer/float sums
# exactly (int64/float64) so host-side statistics match numpy float64
# semantics; dtypes in hot paths remain explicitly 32-bit.
import os as _os

# Virtual CPU devices (sharded runs / tests) may oversubscribe host
# cores; raise the XLA CPU collective rendezvous watchdog (default 40 s
# aborts the process on thread skew). Must precede backend init; no
# effect on TPU. Only effective if jax isn't already imported.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in \
        _os.environ.get("XLA_FLAGS", ""):
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "") +
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Honor JAX_PLATFORMS even when a site hook (e.g. a TPU-plugin
# sitecustomize) registered a backend before this process's environment
# was consulted — subprocesses asking for cpu must get cpu.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
