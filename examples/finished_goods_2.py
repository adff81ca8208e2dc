"""finished-goods-2: identical dataflow to finished-goods-1.

The reference's second variant differs ONLY by string interning in the
model (ArcVal<str>, examples/finished-goods-2/model.rs:8-12) — a
Rust-side allocation optimization. Under Spark the Tungsten UTF8String
representation gives the same effect for free (SURVEY.md §6), so the
Spark transposition is the SAME program; this script keeps the example
inventory 1:1 with the reference.
Run: python examples/finished_goods_2.py [sf_dir] [db]"""

from __future__ import annotations

import sys

from finished_goods_1 import DEFAULT_SF, main

if __name__ == "__main__":
    main(
        sf_dir=sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF,
        db_path=sys.argv[2] if len(sys.argv) > 2 else None,
    )
