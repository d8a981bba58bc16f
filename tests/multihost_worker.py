"""
Worker process for the 2-process multi-host profile test
(tests/test_distributed.py::test_two_process_profile_matches_single).

Run as: python multihost_worker.py <pid> <nproc> <port> <bam> <fasta>
                                   <null_model> <outdir>

Initializes jax.distributed (CPU backend, virtual local devices from
XLA_FLAGS in the environment), then runs the REAL profile() pipeline —
which under process_count > 1 profiles only the scaffolds this process
owns (parallel/distributed.my_scaffolds) and allgathers per-scaffold
payloads before table assembly (reference analogue: the process-pool
runtime, SURVEY §2.16).
"""

import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    bam, fasta, null_model, outdir = sys.argv[4:8]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    from instrain_tpu.config import ProfileConfig
    from instrain_tpu.profile.pipeline import profile

    cfg = ProfileConfig(output=outdir, skip_plot_generation=True,
                        skip_genome_wide=True)
    # byte-identity test mode: EVERY host materializes the complete
    # profile dir (production default "primary" writes only on host 0)
    cfg.distributed_store = "all"
    cfg.variant.null_model = null_model
    profile(bam, fasta, cfg)
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
