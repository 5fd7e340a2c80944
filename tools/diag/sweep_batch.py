"""Batch-size sweep of the flagship throughput benchmark on the attached
chip. Answers VERDICT r03 item #1: is 9.1 solves/s/chip compute-bound or
batch-starved?  Writes tools/diag/sweep_batch.json.

Usage: python tools/diag/sweep_batch.py [B ...]   (default 64 128 256 512)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (sets up the compilation cache)


def main():
    batches = [int(b) for b in sys.argv[1:]] or [64, 128, 256, 512]
    out = []
    for b in batches:
        t0 = time.time()
        r = bench.bench_throughput(b, 45, 2)
        r["wall_s"] = round(time.time() - t0, 1)
        out.append(r)
        print(json.dumps(r), flush=True)
        with open("/root/repo/tools/diag/sweep_batch.json", "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
