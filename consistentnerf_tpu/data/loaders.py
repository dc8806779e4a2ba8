"""Dataset dispatch + prior/mask preparation.

`load_scene(cfg)` is the single entry point: loads the dataset named by
`cfg.dataset_type`, composites white background, and attaches the
consistency masks (on-device hard masks, precomputed soft masks, or edge
masks) the way `run_nerf_view.py:994-1159` does at trainer startup —
with a disk cache of the generated masks.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from consistentnerf_tpu.data.scene import SceneData


def load_deepvoxels(datadir: str, shape: str = "greek",
                    testskip: int = 8) -> SceneData:
    """DeepVoxels loader (legacy vanilla-NeRF support, load_deepvoxels.py)."""
    import imageio.v2 as imageio

    def parse_intrinsics(filepath, target_side_len):
        with open(filepath) as f:
            lines = f.readlines()
        f_, cx, cy = map(float, lines[0].split()[:3])
        grid_barycenter = np.array(list(map(float, lines[1].split())))
        near_plane = float(lines[2])
        scale = float(lines[3])
        height, width = map(float, lines[4].split())
        cx = cx / width * target_side_len
        cy = cy / height * target_side_len
        f_ = target_side_len / height * f_
        return f_, cx, cy, grid_barycenter, scale, near_plane

    def load_pose(filename):
        return np.loadtxt(filename).reshape(4, 4).astype(np.float32)

    basedir = os.path.join(datadir, shape)
    splits = ["train", "val", "test"]
    all_imgs, all_poses, counts = [], [], [0]
    H = W = 512
    focal = None
    for s in splits:
        d = os.path.join(basedir, s if s != "val" else "validation")
        if not os.path.isdir(d):
            d = os.path.join(basedir, s)
        posedir = os.path.join(d, "pose")
        imgdir = os.path.join(d, "rgb")
        fnames = sorted(os.listdir(imgdir))
        skip = 1 if s == "train" or testskip == 0 else testskip
        fnames = fnames[::skip]
        imgs = [
            imageio.imread(os.path.join(imgdir, f)) / 255.0 for f in fnames
        ]
        poses = [
            load_pose(os.path.join(posedir, f.replace(".png", ".txt")))
            for f in fnames
        ]
        focal, cx, cy, _, _, _ = parse_intrinsics(
            os.path.join(basedir, s, "intrinsics.txt")
            if os.path.isfile(os.path.join(basedir, s, "intrinsics.txt"))
            else os.path.join(d, "intrinsics.txt"),
            H,
        )
        all_imgs.append(np.stack(imgs).astype(np.float32)[..., :3])
        all_poses.append(np.stack(poses))
        counts.append(counts[-1] + len(imgs))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    images = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)
    hemi_r = float(np.mean(np.linalg.norm(poses[:, :3, -1], axis=-1)))
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]],
                 np.float32)
    return SceneData(
        images=images,
        poses=poses[:, :3, :4],
        K=K,
        H=H,
        W=W,
        focal=float(focal),
        near=hemi_r - 1.0,
        far=hemi_r + 1.0,
        i_train=i_split[0],
        i_test=i_split[2],
        i_val=i_split[1],
    )


def load_linemod(datadir: str, half_res: bool = False,
                 testskip: int = 8) -> SceneData:
    """LINEMOD loader (legacy vanilla-NeRF support, load_LINEMOD.py)."""
    import json

    import cv2
    import imageio.v2 as imageio

    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(datadir, f"transforms_{s}.json")) as f:
            metas[s] = json.load(f)

    all_imgs, all_poses, counts = [], [], [0]
    K = None
    near = far = None
    for s in splits:
        meta = metas[s]
        skip = 1 if s == "train" or testskip == 0 else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            fname = os.path.join(datadir, frame["file_path"])
            imgs.append(imageio.imread(fname) / 255.0)
            poses.append(np.array(frame["transform_matrix"], np.float32))
        K = np.array(meta["frames"][0]["intrinsic_matrix"], np.float32)
        near = float(meta.get("near", 0.1))
        far = float(meta.get("far", 2.0))
        all_imgs.append(np.stack(imgs).astype(np.float32))
        all_poses.append(np.stack(poses))
        counts.append(counts[-1] + len(imgs))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    images = np.concatenate(all_imgs, 0)[..., :3]
    poses = np.concatenate(all_poses, 0)
    H, W = images.shape[1:3]
    focal = float(K[0, 0])
    if half_res:
        H, W, focal = H // 2, W // 2, focal / 2
        K = K.copy()
        K[:2] /= 2
        images = np.stack(
            [cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA)
             for im in images],
            0,
        )
    return SceneData(
        images=images,
        poses=poses[:, :3, :4],
        K=K[:3, :3],
        H=H,
        W=W,
        focal=focal,
        near=near,
        far=far,
        i_train=i_split[0],
        i_test=i_split[2],
        i_val=i_split[1],
    )


def attach_masks(scene: SceneData, cfg, cache_dir=None) -> SceneData:
    """Attach consistency masks per the configured variant.

    hardmask: on-device reprojection masks (cached as .npy);
    softmask: precomputed Softmask PNGs (run_nerf_view.py:1047-1054);
    canny/sobel: edge masks. Otherwise all-ones.
    """
    import imageio.v2 as imageio

    from consistentnerf_tpu.consistency import masks as masks_mod
    from consistentnerf_tpu.consistency import reproject

    scene.ensure_priors()
    if cfg.use_canny_edge_detection:
        scene.masks = masks_mod.canny_masks(
            scene.images, scene.i_train
        ).astype(np.float32)
        return scene
    if cfg.use_sobel_edge_detection:
        scene.masks = masks_mod.sobel_masks(
            scene.images, scene.i_train
        ).astype(np.float32)
        return scene
    if cfg.softmask:
        scene_name = os.path.basename(os.path.normpath(cfg.datadir))
        out = np.zeros(scene.images.shape[:3], np.float32)
        for i in scene.i_train:
            fname = (
                f"Softmask/{cfg.dataset_type}/{scene_name}/iter_500/"
                f"softmask_{i:04d}_{cfg.softmask_K}per.png"
            )
            if os.path.isfile(fname):
                out[i] = imageio.imread(fname).astype(np.float32) / 255.0
        scene.masks = (out > 0).astype(np.float32)
        return scene
    if cfg.hardmask:
        cache = None
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            # Key on the actual train split and scene shape: reusing an
            # expdir after a split/scene change must regenerate masks, not
            # silently load stale ones (this voided a round-4 POL run).
            ident = "-".join(map(str, scene.i_train)) + ":" + "x".join(
                map(str, scene.images.shape[:3]))
            tag = hashlib.sha1(ident.encode()).hexdigest()[:10]
            cache = os.path.join(
                cache_dir,
                f"hardmask_{cfg.train_view_num}view_"
                f"{cfg.occlusion_threshold}_{tag}.npy",
            )
        if cache and os.path.isfile(cache):
            scene.masks = np.load(cache).astype(np.float32)
            return scene
        hard = reproject.compute_hard_masks(
            scene.poses,
            scene.depths,
            scene.K,
            scene.i_train,
            scene.H,
            scene.W,
            occlusion_threshold=cfg.occlusion_threshold,
        )
        scene.masks = hard.astype(np.float32)
        if cache:
            np.save(cache, hard)
        return scene
    return scene


def load_scene(cfg, attach=True) -> SceneData:
    """Load the dataset named by cfg and prepare priors/masks."""
    if cfg.dataset_type == "blender":
        from consistentnerf_tpu.data.blender import load_blender

        scene = load_blender(
            cfg.datadir,
            half_res=cfg.half_res,
            testskip=cfg.testskip,
            train_view_num=cfg.train_view_num,
            white_bkgd=cfg.white_bkgd,
            depthdir=cfg.depthdir,
        )
    elif cfg.dataset_type == "llff":
        from consistentnerf_tpu.data.llff import load_llff

        scene = load_llff(
            cfg.datadir,
            factor=cfg.factor,
            spherify=cfg.spherify,
            no_ndc=cfg.no_ndc,
            train_view_num=cfg.train_view_num,
            depthdir=cfg.depthdir,
        )
    elif cfg.dataset_type == "dtu":
        from consistentnerf_tpu.data.dtu import load_dtu

        scene = load_dtu(
            cfg.datadir,
            train_view_num=cfg.train_view_num,
            light_idx=cfg.dtu_light_cond,
            num_views=cfg.dtu_max_images,
            use_nerf_depth=cfg.use_nerf_depth,
            split_type=cfg.dtu_split_type,
            depthdir=cfg.depthdir,
        )
    elif cfg.dataset_type == "deepvoxels":
        scene = load_deepvoxels(cfg.datadir, cfg.shape, cfg.testskip)
    elif cfg.dataset_type == "LINEMOD":
        scene = load_linemod(cfg.datadir, cfg.half_res, cfg.testskip)
    elif cfg.dataset_type == "synthetic":
        from consistentnerf_tpu.data import synthetic

        scene = synthetic.make_scene(
            n_views=getattr(cfg, "synthetic_views", 8),
            H=getattr(cfg, "synthetic_hw", 64),
            W=getattr(cfg, "synthetic_hw", 64),
            texture_freq=getattr(cfg, "synthetic_texture_freq", 0.0),
            layout=getattr(cfg, "synthetic_layout", "sphere"),
        ).to_scene_data(
            n_test=getattr(cfg, "synthetic_n_test", 2),
            interleave_test=getattr(cfg, "synthetic_interleave_test", True),
        )
    else:
        raise ValueError(f"Unknown dataset type {cfg.dataset_type!r}")

    if attach and cfg.dataset_type != "dtu":
        cache_dir = os.path.join(cfg.basedir, cfg.expname, "mask_cache")
        scene = attach_masks(scene, cfg, cache_dir)
    elif attach:
        scene.ensure_priors()
    return scene
