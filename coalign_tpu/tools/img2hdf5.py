"""Pack per-timestamp camera PNGs into one imgs.hdf5 per frame.

TPU-first rework of ref opencood/utils/img2hdf5.py: the OPV2V reader
(data/opv2v.py) and camera batcher check for ``{ts}_imgs.hdf5`` next to the
PNGs and read it instead (one open + four decoded arrays beats four PNG
decodes — the reference's "hdf5 is faster than png" fast path,
ref opv2v_basedataset.py:212-219).

Usage: python -m coalign_tpu.tools.img2hdf5 --root <opv2v_root>
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def pack_frame(cav_dir: str, ts: str, num_cams: int = 4) -> str | None:
    import h5py
    from PIL import Image

    paths = [os.path.join(cav_dir, f"{ts}_camera{i}.png")
             for i in range(num_cams)]
    if not all(os.path.exists(p) for p in paths):
        return None
    out = os.path.join(cav_dir, f"{ts}_imgs.hdf5")
    with h5py.File(out, "w") as f:
        for i, p in enumerate(paths):
            f.create_dataset(f"camera{i}",
                             data=np.asarray(Image.open(p)),
                             compression="gzip", compression_opts=1)
            dp = os.path.join(cav_dir, f"{ts}_depth{i}.png")
            if os.path.exists(dp):
                f.create_dataset(f"depth{i}",
                                 data=np.asarray(Image.open(dp)),
                                 compression="gzip", compression_opts=1)
    return out


def pack_root(root: str, num_cams: int = 4) -> int:
    n = 0
    for yaml_path in glob.glob(os.path.join(root, "*", "*", "*.yaml")):
        if "_" in os.path.basename(yaml_path):
            continue
        cav_dir = os.path.dirname(yaml_path)
        ts = os.path.basename(yaml_path)[:-5]
        if pack_frame(cav_dir, ts, num_cams):
            n += 1
    return n


def read_frame_hdf5(cav_dir: str, ts: str, num_cams: int = 4):
    """Returns list of (H, W, 3) uint8 arrays, or None if not packed."""
    import h5py

    path = os.path.join(cav_dir, f"{ts}_imgs.hdf5")
    if not os.path.exists(path):
        return None
    with h5py.File(path, "r") as f:
        return [np.asarray(f[f"camera{i}"]) for i in range(num_cams)
                if f"camera{i}" in f]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True)
    p.add_argument("--num_cams", type=int, default=4)
    opt = p.parse_args(argv)
    print(f"packed {pack_root(opt.root, opt.num_cams)} frames")


if __name__ == "__main__":
    main()
