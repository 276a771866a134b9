"""Micro-bench: scalar vs numpy image-decode throughput (BENCH.md §6).

    python tools/bench_decode.py [side]

Times decode_bmp / decode_png / pixel_digests on a side×side RGB image
(default 512) in both modes and prints one JSON line with MB/s and the
vectorized/scalar speedups.  The 8-16 px synthetic driver assets sit
below _VEC_MIN_BYTES on purpose — this bench is the real-image case the
auto cutoff selects numpy for.
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from kgspark.kernels.image_codec import decode_bmp, decode_png, encode_bmp, encode_png  # noqa: E402
from kgspark.ops.multimodal import pixel_digests, pixel_digests_scalar  # noqa: E402


def best(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(side: int) -> None:
    px = bytes(random.Random(7).randrange(256) for _ in range(side * side * 3))
    bmp = encode_bmp(side, side, px)
    png = encode_png(side, side, px, channels=3)
    mb = len(px) / 1e6
    out: dict = {"side": side, "pixel_mb": round(mb, 2)}
    for name, data, fn in (("bmp", bmp, decode_bmp), ("png", png, decode_png)):
        ts = best(lambda: fn(data, vectorized=False), 3)
        tv = best(lambda: fn(data, vectorized=True), 5)
        assert fn(data, vectorized=True) == fn(data, vectorized=False)
        out[f"{name}_scalar_mb_s"] = round(mb / ts, 1)
        out[f"{name}_numpy_mb_s"] = round(mb / tv, 1)
        out[f"{name}_speedup"] = round(ts / tv, 1)
    ts = best(lambda: pixel_digests_scalar(px), 3)
    tv = best(lambda: pixel_digests(px), 5)
    assert pixel_digests(px) == pixel_digests_scalar(px)
    out["digest_scalar_mb_s"] = round(mb / ts, 1)
    out["digest_numpy_mb_s"] = round(mb / tv, 1)
    out["digest_speedup"] = round(ts / tv, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
