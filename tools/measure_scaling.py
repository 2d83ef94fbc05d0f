"""Standalone scaling measurement (same procedure bench.py uses)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    corpus = bench.materialize_scaling_corpus()
    out = {}
    for cpus in [bench.LO_CPUS, bench.CPUS]:
        r = bench.scaling_build(cpus, corpus)
        print(
            f"local[{cpus}] best: {r['build_s']:.1f}s "
            f"{r['docs_per_sec']:.0f} docs/s",
            flush=True,
        )
        out[cpus] = r["docs_per_sec"]
    eff = (out[bench.CPUS] / out[bench.LO_CPUS]) / (bench.CPUS / bench.LO_CPUS)
    print(f"efficiency: {eff:.3f}")


if __name__ == "__main__":
    main()
