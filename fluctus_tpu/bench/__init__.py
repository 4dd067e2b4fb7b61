from .harness import run_benchmark, run_benchmark_file  # noqa: F401
