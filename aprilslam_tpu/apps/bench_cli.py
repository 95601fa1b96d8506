"""Benchmark CLI: wraps the repo-root bench with configurable knobs."""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="aprilslam_tpu benchmark")
    p.add_argument("--device", choices=["auto", "cpu", "tpu"], default="auto",
                   help="execution platform (auto = TPU when present)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--resolution", type=int, default=1000)
    p.add_argument("--chunks", type=int, default=6)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    os.environ["BENCH_BATCH"] = str(args.batch)
    os.environ["BENCH_RES"] = str(args.resolution)
    os.environ["BENCH_CHUNKS"] = str(args.chunks)
    # Device selection is bench.py's job (BENCH_DEVICE drives its
    # orchestrator/child modes); configuring the platform here would be
    # ignored — bench.py's module-level code would still see "auto" and
    # re-resolve in a child process. "tpu" maps to the tunnel-default child
    # mode, the one that actually works on this host.
    device = "cpu" if args.cpu else args.device
    if device == "cpu":
        os.environ["BENCH_DEVICE"] = "cpu"
    elif device == "tpu":
        os.environ["BENCH_DEVICE"] = "tpu-direct"
    sys.path.insert(0, os.getcwd())
    import importlib.util

    bench_path = os.path.join(os.getcwd(), "bench.py")
    if os.path.exists(bench_path):
        spec = importlib.util.spec_from_file_location("bench", bench_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        return 0
    print("bench.py not found in cwd", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
