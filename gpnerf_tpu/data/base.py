"""Shared per-frame batch assembly for all datasets.

Behavioral port of the reference's dataset `__getitem__`
(/root/reference/libs/datasets/ZjumocapDataset.py:286-519 and
CustomDataset.py:170-440), factored into one base class (the reference
duplicates ~400 lines per dataset) and adapted for static TPU shapes:

  * train rays are padded to exactly `n_rays` with a `ray_valid` mask (the
    reference's resample-until-N loop yields a variable count <= N after the
    AABB filter, SURVEY.md §7 "hard parts");
  * test rays (all pixels in the bound mask) are padded to `test_ray_cap`;
  * `out_sh` is 32-aligned (ZjumocapDataset.py:248-254) and clamped to the
    static `max_out_sh` volume buffer;
  * images are NHWC float32; src images normalized (x - 0.5) / 0.5
    (libs/datasets/transform.py:349-374).

Subclasses provide camera tables, image/mask IO and SMPL loading; this class
provides view selection, ray sampling, voxel-coord construction and the
~30-key batch dict contract.
"""

from __future__ import annotations

import random
from typing import Dict

import numpy as np

from gpnerf_tpu.data.geometry import (
    get_nearest_pose_ids,
    sample_ray,
    transform_can_smpl,
)


def align_up_32(x):
    return (np.asarray(x, np.int32) | 31) + 1


def prepare_smpl_input(xyz_world, Rh_mat, Th, voxel_size, max_out_sh):
    """SMPL canonicalization + voxel coords (ZjumocapDataset.prepare_input,
    :207-256). `Rh_mat` is already a rotation matrix; `Th` is (1, 3).

    Returns feature (S, 6), coord (S, 3) int32 dhw, out_sh (3,) int32,
    can_bounds (2, 3), bounds (2, 3), xyz_can (S, 3).
    """
    min_xyz = np.min(xyz_world, axis=0)
    max_xyz = np.max(xyz_world, axis=0)
    min_xyz = min_xyz.copy()
    max_xyz = max_xyz.copy()
    min_xyz[2] -= 0.05
    max_xyz[2] += 0.05
    can_bounds = np.stack([min_xyz, max_xyz], axis=0).astype(np.float32)

    xyz = np.dot(xyz_world - Th, Rh_mat).astype(np.float32)
    xyz, center, rot, trans = transform_can_smpl(xyz)  # identity (disabled aug)

    min_xyz = np.min(xyz, axis=0)
    max_xyz = np.max(xyz, axis=0)
    min_xyz = min_xyz.copy()
    max_xyz = max_xyz.copy()
    min_xyz[2] -= 0.05
    max_xyz[2] += 0.05
    bounds = np.stack([min_xyz, max_xyz], axis=0).astype(np.float32)

    cxyz = xyz.astype(np.float32)
    feature = np.concatenate([cxyz, np.zeros_like(cxyz)], axis=1).astype(np.float32)

    dhw = xyz[:, [2, 1, 0]]
    min_dhw = min_xyz[[2, 1, 0]]
    max_dhw = max_xyz[[2, 1, 0]]
    voxel_size = np.asarray(voxel_size, np.float32)
    coord = np.round((dhw - min_dhw) / voxel_size).astype(np.int32)

    out_sh = np.ceil((max_dhw - min_dhw) / voxel_size).astype(np.int32)
    out_sh = align_up_32(out_sh)
    max_out_sh = np.asarray(max_out_sh, np.int32)
    if np.any(out_sh > max_out_sh):
        # clamp into the static buffer; coords are clipped accordingly
        out_sh = np.minimum(out_sh, max_out_sh)
    coord = np.minimum(coord, out_sh - 1)
    return feature, coord, out_sh, can_bounds, bounds, xyz, (center, rot, trans)


def _pad_rays(arrays: Dict[str, np.ndarray], count: int, cap: int):
    """Pad the leading ray axis to `cap`; adds 'ray_valid'."""
    out = {}
    n = min(count, cap)
    for k, v in arrays.items():
        pad_shape = (cap,) + v.shape[1:]
        buf = np.zeros(pad_shape, v.dtype)
        buf[:n] = v[:n]
        # duplicate the first ray into the padding so the renderer's math
        # stays finite (padding is masked out of losses/metrics)
        if n > 0 and n < cap:
            buf[n:] = v[0]
        out[k] = buf
    valid = np.zeros((cap,), np.float32)
    valid[:n] = 1.0
    out["ray_valid"] = valid
    return out, n


class HumanNVSDataset:
    """Base dataset. Subclass contract:

      * self.items: list of (seq_name, frame_id) pairs (one per frame)
      * self.num_cams: cameras per split item (__len__ multiplies by it)
      * cameras(seq) -> dict with K (N,3,3), D (N,5) or None, R (N,3,3),
        T (N,3,1); train_ids/test_ids index arrays
      * load_view(seq, frame_id, cam_id) -> (img float32 [0,1] (H,W,3),
        mask uint8 (H,W)) at the *working* resolution (already ratio-scaled,
        undistorted, background NOT yet masked)
      * load_smpl(seq, frame_id) -> (xyz_world (S,3), Rh_mat (3,3), Th (1,3))
    """

    def __init__(
        self,
        split: str,
        src_view_num=3,
        cam_num=-1,
        nrays=1024,
        body_sample_ratio=0.5,
        mask_bkgd=True,
        voxel_size=(0.005, 0.005, 0.005),
        max_out_sh=(96, 384, 384),
        site_cap=8192,
        level_caps=(20480, 10240, 4096, 2048),
        test_ray_cap=65536,
        frame_sampler=False,
        neg_ray=False,
        with_mesh_grid=False,
        inside_view=(0, 6, 12, 18),
    ):
        self.split = split
        self.src_view_num = src_view_num
        self.cam_num = cam_num if cam_num <= 12 else -1
        self.nrays = nrays
        self.body_sample_ratio = body_sample_ratio
        self.mask_bkgd = mask_bkgd
        self.voxel_size = np.asarray(voxel_size, np.float32)
        self.max_out_sh = tuple(int(v) for v in max_out_sh)
        self.site_cap = int(site_cap)
        self.level_caps = tuple(int(c) for c in level_caps)
        self.test_ray_cap = int(test_ray_cap)
        self.frame_sampler = frame_sampler
        self.neg_ray = neg_ray
        self.with_mesh_grid = with_mesh_grid
        self.inside_view = tuple(inside_view)

    # -- subclass API ------------------------------------------------------
    def cameras(self, seq):
        raise NotImplementedError

    def load_view(self, seq, frame_id, cam_id):
        raise NotImplementedError

    def load_smpl(self, seq, frame_id):
        raise NotImplementedError

    def mask_and_camera(self, seq, frame_id, cam_id):
        """Mask + consistent (K, R, T) for the visual-hull views (subclass
        hook for the mesh path; resolution of mask and K must agree)."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    def mesh_grid(self, can_bounds):
        """Dense grid over can_bounds at voxel_size
        (ZjumocapDataset.py:396-406)."""
        vs = self.voxel_size
        x = np.arange(can_bounds[0, 0], can_bounds[1, 0] + vs[0], vs[0])
        y = np.arange(can_bounds[0, 1], can_bounds[1, 1] + vs[1], vs[1])
        z = np.arange(can_bounds[0, 2], can_bounds[1, 2] + vs[2], vs[2])
        return np.stack(np.meshgrid(x, y, z, indexing="ij"), axis=-1).astype(
            np.float32
        )

    def prepare_inside_pts(self, pts, seq, frame_id):
        """Visual hull from the inside-view masks
        (ZjumocapDataset.prepare_inside_pts, :259-283)."""
        from gpnerf_tpu.data.geometry import project

        sh = pts.shape
        pts3d = pts.reshape(-1, 3)
        inside = np.ones(len(pts3d), np.uint8)
        for nv in self.inside_view:
            ind = inside == 1
            msk, K, R, T = self.mask_and_camera(seq, frame_id, nv)
            RT = np.concatenate([R, T.reshape(3, 1)], axis=1)
            pts2d = np.round(project(pts3d[ind], K, RT)).astype(np.int32)
            H, W = msk.shape[:2]
            pts2d[:, 0] = np.clip(pts2d[:, 0], 0, W - 1)
            pts2d[:, 1] = np.clip(pts2d[:, 1], 0, H - 1)
            inside[ind] = (msk[pts2d[:, 1], pts2d[:, 0]] != 0).astype(np.uint8)
        return inside.reshape(*sh[:-1])

    def __len__(self):
        return len(self.items) * self.num_cams

    def select_views(self, cams, cam_id):
        """Target + source view selection (ZjumocapDataset.py:310-353)."""
        train_ids = np.asarray(cams["train_ids"])
        test_ids = np.asarray(cams["test_ids"])
        all_ids = np.arange(len(cams["R"]))

        if self.split == "train":
            render_ids = [i for i in all_ids if i not in train_ids]
            subsample_factor = np.random.choice(np.arange(1, 4), p=[0.2, 0.45, 0.35])
            if self.frame_sampler:
                id_render = cam_id % len(render_ids)
            else:
                id_render = random.randrange(len(render_ids))
            test_ind = render_ids[id_render]
        else:
            render_ids = test_ids
            subsample_factor = 1
            if self.frame_sampler:
                test_ind = render_ids[cam_id % len(render_ids)]
            else:
                test_ind = render_ids[random.randrange(len(render_ids))]
            id_render = -1

        R = np.asarray(cams["R"])
        T = np.asarray(cams["T"]).reshape(-1, 3, 1)
        tar_cam_loc = -np.dot(R[test_ind].T, T[test_ind]).ravel()
        ref_R = R[train_ids]
        ref_T = T[train_ids]
        ref_cam_locs = -np.matmul(ref_R.transpose(0, 2, 1), ref_T).squeeze(-1)

        if self.cam_num != -1 and self.cam_num <= self.src_view_num:
            sample_num = self.cam_num
        else:
            sample_num = min(self.src_view_num * subsample_factor, 8)

        nearest = get_nearest_pose_ids(tar_cam_loc, ref_cam_locs, sample_num)
        if self.cam_num == -1 or self.cam_num > self.src_view_num:
            nearest = np.random.choice(
                nearest, min(self.src_view_num, len(nearest)), replace=False
            )
            if self.split == "train" and np.random.choice([0, 1], p=[0.995, 0.005]):
                nearest[np.random.choice(len(nearest))] = id_render
        src_inds = train_ids[nearest]
        return int(test_ind), np.asarray(src_inds, np.int64)

    def __getitem__(self, index):
        if isinstance(index, (list, tuple)):
            index = index[0]
        cam_id = index % self.num_cams
        item = index // self.num_cams
        seq, frame_id = self.items[item]
        cams = self.cameras(seq)

        test_ind, src_inds = self.select_views(cams, cam_id)

        # target view
        img, msk = self.load_view(seq, frame_id, test_ind)
        H, W = img.shape[:2]
        K = np.asarray(cams["K"][test_ind], np.float32).copy()
        R = np.asarray(cams["R"][test_ind], np.float32)
        T = np.asarray(cams["T"][test_ind], np.float32).reshape(3, 1)
        if self.mask_bkgd:
            img = img.copy()
            img[msk == 0] = 0
        # images ship as raw uint8 (exactly what was on disk): host->device
        # transfer is the train-step bottleneck on tunneled runtimes and the
        # device-side (x/255 - 0.5)/0.5 recovers the float frame exactly
        # (render/base.src_norm)
        tar_img = np.round(img * 255.0).astype(np.uint8)

        # SMPL
        xyz_world, Rh_mat, Th = self.load_smpl(seq, frame_id)
        (
            feature,
            coord,
            out_sh,
            can_bounds,
            bounds,
            _xyz_can,
            _aug,
        ) = prepare_smpl_input(
            xyz_world, Rh_mat, Th, self.voxel_size, self.max_out_sh
        )

        # rays
        rgb, ray_o, ray_d, near, far, coord2d, mask_at_box, body_msk = sample_ray(
            img,
            msk.astype(np.int64),
            K,
            R,
            T[..., 0],
            can_bounds,
            self.nrays,
            self.split,
            self.body_sample_ratio,
        )

        ray_cap = self.nrays if self.split == "train" else self.test_ray_cap
        padded, n_rays = _pad_rays(
            {
                "rgb": rgb,
                "ray_o": ray_o,
                "ray_d": ray_d,
                "near": near.astype(np.float32),
                "far": far.astype(np.float32),
                "body_msk": body_msk.astype(np.float32),
            },
            len(rgb),
            ray_cap,
        )

        # source views
        src_imgs, src_poses, src_Ks = [], [], []
        for cam_ind in src_inds:
            simg, smsk = self.load_view(seq, frame_id, int(cam_ind))
            if self.mask_bkgd:
                simg = simg.copy()
                simg[smsk == 0] = 0
            sK = np.asarray(cams["K"][cam_ind], np.float32)
            sR = np.asarray(cams["R"][cam_ind], np.float32)
            sT = np.asarray(cams["T"][cam_ind], np.float32).reshape(3, 1)
            src_imgs.append(np.round(simg * 255.0).astype(np.uint8))
            src_poses.append(np.concatenate([sR, sT], axis=-1))
            src_Ks.append(sK)

        target_pose = np.concatenate([R, T], axis=-1).astype(np.float32)

        if self.split == "train":
            # train rays were already AABB-filtered by sample_ray; the padded
            # ray_valid mask is the per-ray box mask
            mask_at_box = padded["ray_valid"] > 0
        ret = {
            "tar_img": tar_img,
            "feature": feature,
            "coord": coord,
            "out_sh": out_sh,
            "mask_at_box": mask_at_box,  # full-image bool (test) / per-ray (train)
            "target_pose": target_pose,
            "target_K": K,
            "target_K_inv": np.linalg.inv(K).astype(np.float32),
            "src_imgs": np.stack(src_imgs),
            "src_poses": np.stack(src_poses).astype(np.float32),
            "src_Ks": np.stack(src_Ks).astype(np.float32),
            "can_bounds": can_bounds,
            "bounds": bounds,
            "R": Rh_mat.astype(np.float32),
            "Rh": Rh_mat.astype(np.float32),
            "Th": Th.astype(np.float32),
            "latent_index": np.int32(frame_id),
            "frame_index": np.int32(frame_id),
            "cam_ind": np.int32(test_ind),
            "n_rays": np.int32(n_rays),
            "img_hw": np.asarray([H, W], np.int32),
        }
        ret.update(padded)
        # host-built sparse pyramid + conv rulebooks (pure geometry; the
        # device-side build cost ~50 ms/frame of op dispatch, see
        # data/sparse_host.py)
        from gpnerf_tpu.data.sparse_host import build_host_pyramid

        ret.update(
            build_host_pyramid(
                coord, self.max_out_sh, self.site_cap, self.level_caps
            )
        )
        if self.with_mesh_grid:
            pts = self.mesh_grid(can_bounds)
            ret["pts"] = pts
            ret["inside"] = self.prepare_inside_pts(pts, seq, frame_id)
        return ret
