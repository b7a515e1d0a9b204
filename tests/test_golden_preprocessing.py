"""Golden-input preprocessing parity (SURVEY §7 hard-part 4).

An independent torch/PIL restatement of the reference's exact preprocessing
(PrepareImageInputs.img_transform + mmlabNormalize,
datasets/pipelines/loading.py:17-146, and PointToMultiViewDepthandHeight,
loading_new.py:29-202) is run against our numpy pipeline
(dhd_tpu/data/pipeline.py) on deterministic synthetic inputs.  Both sides
call the same PIL ops, so agreement is exact (bit-for-bit for the image
path, fp32-tolerance for the projective math).

This pins the eval-input parity story that the 36.50-mIoU chase depends on:
any transcription drift in aug parameters, homography bookkeeping, the
BGR-normalize quirk, or the z-buffer projection shows up here.
"""
import numpy as np
import pytest
import torch
from PIL import Image

from dhd_tpu.data.pipeline import (aug_homography, normalize_img,
                                   points_to_depth_height,
                                   sample_augmentation, transform_image,
                                   zbuffer_scatter)


def _synthetic_image(h=900, w=1600, seed=0):
    """Deterministic structured uint8 image (gradients + random blocks)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // w), (yy * 255 // h),
                    ((xx + yy) * 255 // (h + w))], axis=-1).astype(np.uint8)
    blocks = rng.integers(0, 256, (15, 20, 3), np.uint8)
    img = (img.astype(np.int32)
           + np.kron(blocks, np.ones((60, 80, 1), np.int32)) // 2)
    return np.clip(img, 0, 255).astype(np.uint8)


# --- reference restatement (torch, following loading.py line by line) ----


def _ref_get_rot(h):
    return torch.Tensor([[np.cos(h), np.sin(h)], [-np.sin(h), np.cos(h)]])


def _ref_img_transform(img, resize, resize_dims, crop, flip, rotate):
    """loading.py:96-146."""
    img = img.resize(resize_dims)
    img = img.crop(crop)
    if flip:
        img = img.transpose(method=Image.FLIP_LEFT_RIGHT)
    img = img.rotate(rotate)

    post_rot = torch.eye(2)
    post_tran = torch.zeros(2)
    post_rot *= resize
    post_tran -= torch.Tensor(crop[:2])
    if flip:
        A = torch.Tensor([[-1, 0], [0, 1]])
        b = torch.Tensor([crop[2] - crop[0], 0])
        post_rot = A.matmul(post_rot)
        post_tran = A.matmul(post_tran) + b
    A = _ref_get_rot(rotate / 180 * np.pi)
    b = torch.Tensor([crop[2] - crop[0], crop[3] - crop[1]]) / 2
    b = A.matmul(-b) + b
    post_rot = A.matmul(post_rot)
    post_tran = A.matmul(post_tran) + b
    return img, post_rot, post_tran


def _ref_normalize(img):
    """mmlabNormalize (loading.py:17-24): PIL RGB array + imnormalize with
    to_rgb=True, whose cv2.cvtColor(BGR2RGB) swaps the channel order of the
    already-RGB array — the BEVDet quirk."""
    arr = np.array(img).astype(np.float32)
    arr = arr[..., ::-1]                       # the to_rgb channel swap
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    return (arr - mean) / std


def _ref_sample_augmentation_eval(H, W, fH, fW, resize_test=0.0,
                                  crop_h=(0.0, 0.0)):
    """loading.py:55-94, eval branch."""
    resize = float(fW) / float(W) + resize_test
    resize_dims = (int(W * resize), int(H * resize))
    newW, newH = resize_dims
    crop_h_v = int((1 - np.mean(crop_h)) * newH) - fH
    crop_w = int(max(0, newW - fW) / 2)
    crop = (crop_w, crop_h_v, crop_w + fW, crop_h_v + fH)
    return resize, resize_dims, crop, False, 0


def test_eval_image_path_bit_parity():
    """Eval-mode resize/crop + normalize: bit-for-bit vs the reference
    restatement (aug is deterministic at test time, loading.py:81-93)."""
    src = _synthetic_image()
    H, W = src.shape[:2]
    fH, fW = 256, 704

    r_resize, r_dims, r_crop, r_flip, r_rot = \
        _ref_sample_augmentation_eval(H, W, fH, fW)
    ref_img, ref_pr, ref_pt = _ref_img_transform(
        Image.fromarray(src), r_resize, r_dims, r_crop, r_flip, r_rot)
    ref_arr = _ref_normalize(ref_img)

    resize, dims, crop, flip, rot = sample_augmentation(
        (H, W), (fH, fW), is_train=False, rng=None)
    assert (resize, dims, crop, flip, rot) == \
        (r_resize, r_dims, r_crop, bool(r_flip), float(r_rot))
    our_img = transform_image(Image.fromarray(src), dims, crop, flip, rot)
    our_arr = normalize_img(np.array(our_img))
    np.testing.assert_array_equal(np.array(our_img), np.array(ref_img))
    np.testing.assert_allclose(our_arr, ref_arr, rtol=0, atol=0)

    pr, pt = aug_homography(resize, crop, flip, rot)
    np.testing.assert_allclose(pr, ref_pr.numpy(), atol=1e-6)
    np.testing.assert_allclose(pt, ref_pt.numpy(), atol=1e-5)


@pytest.mark.parametrize("flip,rotate", [(False, 3.2), (True, -5.4),
                                         (True, 0.0)])
def test_train_aug_path_bit_parity(flip, rotate):
    """Train-mode aug (resize jitter + crop + flip + rotate): image pixels
    bit-for-bit and the post_rot/post_tran homography to fp32 tolerance."""
    src = _synthetic_image(seed=3)
    H, W = src.shape[:2]
    fH, fW = 256, 704
    resize = float(fW) / float(W) + 0.07
    dims = (int(W * resize), int(H * resize))
    newW, newH = dims
    crop_h_v = int((1 - 0.0) * newH) - fH
    crop_w = 37
    crop = (crop_w, crop_h_v, crop_w + fW, crop_h_v + fH)

    ref_img, ref_pr, ref_pt = _ref_img_transform(
        Image.fromarray(src), resize, dims, crop, flip, rotate)
    our_img = transform_image(Image.fromarray(src), dims, crop, flip, rotate)
    np.testing.assert_array_equal(np.array(our_img), np.array(ref_img))

    pr, pt = aug_homography(resize, crop, flip, rotate)
    np.testing.assert_allclose(pr, ref_pr.numpy(), atol=1e-6)
    np.testing.assert_allclose(pt, ref_pt.numpy(), atol=1e-4)


# --- lidar -> depth/height maps (loading_new.py) -------------------------


def _ref_points2map(points, height, width, depth_lim, downsample=1,
                    with_height=False):
    """points2depthmap/points2heightmap (loading_new.py:29-99), torch."""
    height_, width_ = height // downsample, width // downsample
    out = torch.zeros((height_, width_), dtype=torch.float32)
    coor = torch.round(points[:, :2] / downsample)
    values = points[:, 3] if with_height else points[:, 2]
    depth = points[:, 2]
    kept1 = ((coor[:, 0] >= 0) & (coor[:, 0] < width_)
             & (coor[:, 1] >= 0) & (coor[:, 1] < height_)
             & (depth < depth_lim[1]) & (depth >= depth_lim[0]))
    coor, values = coor[kept1], values[kept1]
    ranks = coor[:, 0] + coor[:, 1] * width_
    sort = (ranks + depth[kept1] / 100.0).argsort()
    coor, values, ranks = coor[sort], values[sort], ranks[sort]
    kept2 = torch.ones(coor.shape[0], dtype=torch.bool)
    kept2[1:] = ranks[1:] != ranks[:-1]
    coor, values = coor[kept2], values[kept2]
    coor = coor.to(torch.long)
    out[coor[:, 1], coor[:, 0]] = values
    return out


def test_depth_height_projection_parity():
    """Full lidar->(u,v,d,h) chain + z-buffer maps vs the reference
    restatement on synthetic points and poses (loading_new.py:101-185)."""
    rng = np.random.default_rng(4)
    h_img, w_img = 256, 704
    n_pts = 20000
    pts = np.concatenate([
        rng.uniform(-50, 50, (n_pts, 2)),
        rng.uniform(-3, 4, (n_pts, 1)),
    ], axis=1).astype(np.float32)

    curr = {
        "lidar2ego_rotation": [0.999, 0.01, -0.02, 0.03],
        "lidar2ego_translation": [0.9, 0.0, 1.8],
        "ego2global_rotation": [0.97, 0.0, 0.0, 0.24],
        "ego2global_translation": [400.0, 1100.0, 0.0],
        "cams": {"CAM_FRONT": {
            "sensor2ego_rotation": [0.5, -0.5, 0.5, -0.5],
            "sensor2ego_translation": [1.5, 0.0, 1.5],
            "ego2global_rotation": [0.97, 0.001, -0.002, 0.241],
            "ego2global_translation": [400.05, 1100.02, 0.001],
        }},
    }
    intrin = np.array([[560.0, 0.0, 352.0], [0.0, 560.0, 128.0],
                       [0.0, 0.0, 1.0]], np.float32)
    post_rot = np.array([[0.44, 0.0, 0.0], [0.0, 0.44, 0.0],
                         [0.0, 0.0, 1.0]], np.float32)
    post_tran = np.array([-3.0, -140.0, 0.0], np.float32)

    our_depth, our_height = points_to_depth_height(
        pts, curr, "CAM_FRONT", intrin, post_rot, post_tran,
        (h_img, w_img), (1.0, 45.0))

    # reference restatement
    from dhd_tpu.data.nuscenes import pose_to_mat
    l2le = torch.from_numpy(pose_to_mat(curr["lidar2ego_rotation"],
                                        curr["lidar2ego_translation"]))
    le2g = torch.from_numpy(pose_to_mat(curr["ego2global_rotation"],
                                        curr["ego2global_translation"]))
    cam = curr["cams"]["CAM_FRONT"]
    c2ce = torch.from_numpy(pose_to_mat(cam["sensor2ego_rotation"],
                                        cam["sensor2ego_translation"]))
    ce2g = torch.from_numpy(pose_to_mat(cam["ego2global_rotation"],
                                        cam["ego2global_translation"]))
    cam2img = torch.eye(4)
    cam2img[:3, :3] = torch.from_numpy(intrin)
    lidar2cam = torch.inverse(ce2g.matmul(c2ce)).matmul(le2g.matmul(l2le))
    lidar2img = cam2img.matmul(lidar2cam)
    p = torch.from_numpy(pts)
    p_ego = p.matmul(l2le[:3, :3].T) + l2le[:3, 3].unsqueeze(0)
    p_img = p.matmul(lidar2img[:3, :3].T) + lidar2img[:3, 3].unsqueeze(0)
    p_img = torch.cat([p_img[:, :2] / p_img[:, 2:3], p_img[:, 2:3],
                       p_ego[:, 2:3]], 1)
    p_img[:, :3] = p_img[:, :3].matmul(
        torch.from_numpy(post_rot).T) + torch.from_numpy(post_tran)[None]
    ref_depth = _ref_points2map(p_img, h_img, w_img, (1.0, 45.0))
    ref_height = _ref_points2map(p_img, h_img, w_img, (1.0, 45.0),
                                 with_height=True)
    np.testing.assert_allclose(our_depth, ref_depth.numpy(), atol=2e-3)
    np.testing.assert_allclose(our_height, ref_height.numpy(), atol=2e-3)


def test_zbuffer_keeps_nearest():
    coor = np.array([[3, 2], [3, 2], [5, 1]], np.float32)
    depth = np.array([7.0, 4.0, 9.0], np.float32)
    out = zbuffer_scatter(coor, depth, depth, 4, 8)
    assert out[2, 3] == 4.0 and out[1, 5] == 9.0
