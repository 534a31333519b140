"""Print a sha256 of the packed dense-frame detection output at 1024^2.

The byte-identity gate for layout/numerics rewrites (see BASELINE.md):
run before and after a change; equal hashes prove the full packed
detection result (count header + circles + scores) is unchanged.

    python scripts/frame_sha.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from magnify_tpu.ops.detect import (  # noqa: E402
    _stage_dense_packed,
    normalize_planes_u8,
)

H = W = int(os.environ.get("CHAIN_SIZE", "1024"))


def main():
    rng = np.random.default_rng(0)
    img = rng.normal(100, 5, (H, W)).astype(np.uint16)
    from magnify_tpu.utils import filled_circle_points

    for pos in [(r * 97 + 60, c * 83 + 50) for r in range(10)
                for c in range(11)]:
        pts = filled_circle_points(10) + np.array(pos)
        img[pts[:, 0], pts[:, 1]] = 1000
    plane = jnp.asarray(normalize_planes_u8(img[None])[0].astype(np.float32))

    packed, _full = _stage_dense_packed(
        plane, 0.1, 0.9, 0.3, min_radius=8, max_radius=12, cap=2048,
        nms_cap=2048, min_dist=8, pull_cap=511, normalized=True)
    rows = np.asarray(packed)
    from magnify_tpu.ops.detect import unpack_count

    print("packed sha256:", hashlib.sha256(rows.tobytes()).hexdigest()[:16],
          "shape:", rows.shape, "n:", unpack_count(rows[0, 0]))


if __name__ == "__main__":
    main()
