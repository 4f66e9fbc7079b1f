"""`python -m aocl_compression_tpu.bench` — the benchmark/validation CLI
(tools/bench_cli.py; parity with the reference's aocl_compression_bench)."""

from .tools.bench_cli import main

if __name__ == "__main__":
    import sys
    sys.exit(main())
