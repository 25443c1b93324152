"""Shard a dataset csv into parquet files (behavioral reference:
scripts/cnv/shard.py — parquet sharding for the EfficientParquet loader).

Usage: python scripts/cnv/shard.py INPUT.csv OUT_DIR [--shard-size 100000]
"""

from __future__ import annotations

import os
import sys

import pandas as pd


def main():
    src, out_dir = sys.argv[1], sys.argv[2]
    shard_size = 100_000
    if "--shard-size" in sys.argv:
        shard_size = int(sys.argv[sys.argv.index("--shard-size") + 1])
    os.makedirs(out_dir, exist_ok=True)
    df = pd.read_csv(src) if src.endswith(".csv") else pd.read_parquet(src)
    n = 0
    for start in range(0, len(df), shard_size):
        shard = df.iloc[start:start + shard_size]
        shard.to_parquet(os.path.join(out_dir, f"shard_{n:05d}.parquet"), index=False)
        n += 1
    print(f"wrote {n} shards ({len(df)} rows) to {out_dir}")


if __name__ == "__main__":
    main()
