"""Build a second-level replicated corpus (e.g. sf100 = 10x the sf10
soak corpus) with COLLISION-SAFE key shifts.

tools/soak.py:build_soak shifts event_id by k * 10^12 per replica;
an sf10 corpus already occupies k = 0..99 of that space, so replaying
the same shifts on an sf10 BASE would collide replica keys with
existing ones.  This wrapper widens every shift by the base corpus's
own replication factor before delegating to build_soak — the only
thing level-2 replication needs (id magnitudes stay < 10^16, far
inside int64; every catalog predicate is mod/md5-based, magnitude-
agnostic).

Usage: python tools/build_scale.py BASE_DIR OUT_DIR N SHIFT_MULT
e.g.:  python tools/build_scale.py /tmp/sf10 /tmp/sf100 10 1000
"""

from __future__ import annotations

import importlib.util
import sys

sys.path.insert(0, ".")


def main() -> None:
    base, out = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3])
    mult = int(sys.argv[4])

    spec = importlib.util.spec_from_file_location("soak", "tools/soak.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    for table, shifts in m._SHIFTS.items():
        for col in shifts:
            shifts[col] *= mult

    from tomasz_weight_tracker_spark.session import get_spark

    spark = get_spark("build-scale")
    m.build_soak(spark, base, out, n)
    print(f"built {out} = {n}x {base} (shift x{mult})", flush=True)


if __name__ == "__main__":
    main()
