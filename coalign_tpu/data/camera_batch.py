"""Camera batch assembly: images + calibration -> padded device tensors.

TPU-first rework of the reference's camera branch of the intermediate
fusion dataset (ref intermediate_fusion_dataset.py:133-214): per-agent
camera images are resized to the network input size (``final_dim``), the
resize is folded into (post_rots, post_trans) exactly like the reference's
img_transform (ref camera_utils.py:62), and extrinsics come from the OPV2V
yaml camera blocks: T_lidar<-camera = x1_to_x2(camera cords, lidar pose)
followed by the UE4 -> OpenCV axis permutation
(ref opv2v_basedataset.py:436-447 get_ext_int).
"""

from __future__ import annotations

import numpy as np

from coalign_tpu.utils.transforms import inverse_tfm, pose_to_tfm

# UE4 camera axes -> OpenCV (ref opv2v_basedataset.py:441-443)
UE4_TO_CV = np.array([[0, 0, 1, 0], [1, 0, 0, 0],
                      [0, -1, 0, 0], [0, 0, 0, 1]], dtype=np.float32)


def camera_to_lidar_ext(camera_cords, lidar_pose):
    """T_lidar<-camera(OpenCV) from world camera pose + world lidar pose."""
    t_wc = np.asarray(pose_to_tfm(np.asarray(camera_cords,
                                             dtype=np.float64)))
    t_lw = np.asarray(inverse_tfm(pose_to_tfm(np.asarray(
        lidar_pose, dtype=np.float64))))
    return (t_lw @ t_wc @ UE4_TO_CV).astype(np.float32)


def load_image(path, final_hw):
    """Load + resize a camera PNG; returns (img (H, W, 3) float [0, 1],
    post_rot (3, 3), post_trans (3,)) encoding the resize."""
    from PIL import Image

    img = Image.open(path)
    w0, h0 = img.size
    h, w = final_hw
    img = img.resize((w, h), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32)[..., :3] / 255.0
    post_rot = np.eye(3, dtype=np.float32)
    post_rot[0, 0] = w / w0
    post_rot[1, 1] = h / h0
    return arr, post_rot, np.zeros(3, dtype=np.float32)


def img_transform(img, resize: float, crop, flip: bool, final_hw):
    """Apply resize -> crop -> optional horizontal flip to a PIL image and
    return (array, post_rot, post_trans) so that
    ``aug_pix = post_rot @ orig_pix + post_trans`` — the mapping
    get_geometry inverts (ref camera_utils.py:62 img_transform)."""
    from PIL import Image

    w0, h0 = img.size
    h, w = final_hw
    img = img.resize((int(round(w0 * resize)), int(round(h0 * resize))),
                     Image.BILINEAR)
    x0, y0 = crop
    img = img.crop((x0, y0, x0 + w, y0 + h))
    post_rot = np.eye(3, dtype=np.float32)
    post_rot[0, 0] = resize
    post_rot[1, 1] = resize
    post_trans = np.array([-x0, -y0, 0.0], dtype=np.float32)
    if flip:
        # x' = (w-1) - x  =>  compose R=diag(-1,1), T=(w-1, 0) on the left
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        post_rot[0, :] = -post_rot[0, :]
        post_trans[0] = (w - 1) - post_trans[0]
    arr = np.asarray(img, dtype=np.float32)[..., :3] / 255.0
    return arr, post_rot, post_trans


class CameraAugmentor:
    """Random resize/crop/flip sampling (ref camera_utils.py:33
    sample_augmentation)."""

    def __init__(self, final_dim, resize_lim=(1.0, 1.0), rand_flip=False,
                 seed: int = 303):
        self.final_dim = tuple(final_dim)
        self.resize_lim = resize_lim
        self.rand_flip = rand_flip
        self.rng = np.random.default_rng(seed)

    def sample(self, w0: int, h0: int):
        h, w = self.final_dim
        min_resize = max(w / w0, h / h0)
        resize = max(float(self.rng.uniform(*self.resize_lim)), min_resize)
        new_w, new_h = int(round(w0 * resize)), int(round(h0 * resize))
        x0 = int(self.rng.integers(0, max(new_w - w, 0) + 1))
        y0 = int(self.rng.integers(0, max(new_h - h, 0) + 1))
        flip = bool(self.rand_flip and self.rng.integers(0, 2))
        return resize, (x0, y0), flip


class CameraBatcher:
    """Assemble ``image_inputs`` batches from canonical frames with camera
    data (data/opv2v.py ``load_camera=True``)."""

    def __init__(self, max_cav=5, num_cams=4, final_dim=(480, 640),
                 max_objects=100, lidar_range=(-48, -48, -3, 48, 48, 1),
                 comm_range=70.0, pos_std=0.0, rot_std=0.0, seed=303,
                 augmentor: "CameraAugmentor | None" = None,
                 laplace=False):
        from coalign_tpu.data.batch import IntermediateFusionBatcher

        self.max_cav = max_cav
        self.num_cams = num_cams
        self.final_dim = tuple(final_dim)
        self.augmentor = augmentor
        # reuse the lidar batcher for poses / gt / pairwise transforms
        self.base = IntermediateFusionBatcher(
            max_cav=max_cav, max_points=1, max_objects=max_objects,
            lidar_range=lidar_range, comm_range=comm_range,
            pos_std=pos_std, rot_std=rot_std, seed=seed, laplace=laplace)

    def assemble(self, frames: list) -> dict:
        # frames may lack lidar points; give the base batcher stubs
        stub_frames = []
        for frame in frames:
            stub_agents = []
            for ag in frame["agents"]:
                a = dict(ag)
                if "points" not in a:
                    a["points"] = np.zeros((1, 4), dtype=np.float32)
                stub_agents.append(a)
            stub_frames.append({"agents": stub_agents,
                                "objects": frame["objects"]})
        batch = self.base.assemble(stub_frames)

        b, l, n = len(frames), self.max_cav, self.num_cams
        h, w = self.final_dim
        imgs = np.zeros((b, l, n, h, w, 3), dtype=np.float32)
        rots = np.tile(np.eye(3, dtype=np.float32), (b, l, n, 1, 1))
        trans = np.zeros((b, l, n, 3), dtype=np.float32)
        intrins = np.tile(np.eye(3, dtype=np.float32), (b, l, n, 1, 1))
        post_rots = np.tile(np.eye(3, dtype=np.float32), (b, l, n, 1, 1))
        post_trans = np.zeros((b, l, n, 3), dtype=np.float32)

        for bi, frame in enumerate(frames):
            for ai, ag in enumerate(frame["agents"][:l]):
                cams = ag.get("cameras", {})
                files = ag.get("camera_files", [])
                arrays = ag.get("camera_arrays", [])  # in-memory (synthetic)
                for ci in range(min(n, len(cams))):
                    cam = cams.get(f"camera{ci}")
                    if cam is None:
                        continue
                    ext = camera_to_lidar_ext(cam["cords"], ag["pose"])
                    rots[bi, ai, ci] = ext[:3, :3]
                    trans[bi, ai, ci] = ext[:3, 3]
                    intrins[bi, ai, ci] = cam["intrinsic"]
                    if ci < len(arrays):
                        arr = np.asarray(arrays[ci], dtype=np.float32)
                        h0, w0 = arr.shape[:2]
                        if (h0, w0) != tuple(self.final_dim):
                            from PIL import Image

                            h_, w_ = self.final_dim
                            arr8 = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
                            arr = np.asarray(
                                Image.fromarray(arr8).resize(
                                    (w_, h_), Image.BILINEAR),
                                dtype=np.float32) / 255.0
                            pr = np.eye(3, dtype=np.float32)
                            pr[0, 0] = w_ / w0
                            pr[1, 1] = h_ / h0
                            post_rots[bi, ai, ci] = pr
                        imgs[bi, ai, ci] = arr
                        continue
                    if ci < len(files):
                        from PIL import Image

                        # hdf5 fast path (tools/img2hdf5.py pack_root;
                        # ref opv2v_basedataset.py:212 "hdf5 is faster")
                        if ci == 0:
                            import os

                            from coalign_tpu.tools.img2hdf5 import \
                                read_frame_hdf5
                            d = os.path.dirname(files[0])
                            ts = os.path.basename(files[0]).split("_")[0]
                            self._hdf5_cache = read_frame_hdf5(d, ts, n)
                        cached = getattr(self, "_hdf5_cache", None)
                        pil = (Image.fromarray(cached[ci])
                               if cached and ci < len(cached)
                               else Image.open(files[ci]))
                        if self.augmentor is not None:
                            rs, crop, flip = self.augmentor.sample(*pil.size)
                            img, pr, pt = img_transform(
                                pil, rs, crop, flip, self.final_dim)
                        else:
                            h_, w_ = self.final_dim
                            arr = np.asarray(
                                pil.resize((w_, h_), Image.BILINEAR),
                                dtype=np.float32)[..., :3] / 255.0
                            img = arr
                            pr = np.eye(3, dtype=np.float32)
                            pr[0, 0] = w_ / pil.size[0]
                            pr[1, 1] = h_ / pil.size[1]
                            pt = np.zeros(3, dtype=np.float32)
                        imgs[bi, ai, ci] = img
                        post_rots[bi, ai, ci] = pr
                        post_trans[bi, ai, ci] = pt

        batch["image_inputs"] = {
            "imgs": imgs, "rots": rots, "trans": trans, "intrins": intrins,
            "post_rots": post_rots, "post_trans": post_trans,
        }
        batch.pop("points", None)
        batch.pop("point_mask", None)
        return batch

    def batches(self, dataset, batch_size, shuffle=True, drop_last=True):
        idx = np.arange(len(dataset))
        if shuffle:
            self.base.rng.shuffle(idx)
        for start in range(0, len(idx), batch_size):
            chunk = idx[start:start + batch_size]
            if drop_last and len(chunk) < batch_size:
                return
            yield self.assemble([dataset[i] for i in chunk])
