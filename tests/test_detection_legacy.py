"""Legacy detection utilities (bbox coder + rotated NMS)."""
import numpy as np

from dhd_tpu.eval.detection_legacy import (
    CenterPointBBoxCoder, nms_bev, rotated_iou_bev)


def test_rotated_iou_axis_aligned():
    a = np.array([0.0, 0.0, 2.0, 2.0, 0.0])
    b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0],    # half overlap
                  [5.0, 5.0, 2.0, 2.0, 0.0],    # none
                  [0.0, 0.0, 2.0, 2.0, 0.0]])   # identical
    ious = rotated_iou_bev(a, b)
    np.testing.assert_allclose(ious, [1 / 3, 0.0, 1.0], atol=1e-6)


def test_rotated_iou_45deg():
    a = np.array([0.0, 0.0, 2.0, 2.0, 0.0])
    b = np.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
    iou = rotated_iou_bev(a, b)[0]
    # square vs 45deg square: intersection is a regular octagon
    inter = 8 * (np.sqrt(2) - 1)
    expect = inter / (8 - inter)
    np.testing.assert_allclose(iou, expect, atol=1e-4)


def test_nms_bev_suppresses():
    boxes = np.array([[0, 0, 2, 2, 0.0], [0.1, 0, 2, 2, 0.0],
                      [5, 5, 2, 2, 0.0]], np.float32)
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_bev(boxes, scores, thresh=0.5)
    assert list(keep) == [0, 2]


def test_bbox_coder_decodes_peak():
    h = w = 8
    heat = np.zeros((1, 2, h, w), np.float32)
    heat[0, 1, 3, 5] = 0.95
    reg = np.zeros((1, 2, h, w), np.float32)
    reg[0, :, 3, 5] = 0.5
    hei = np.zeros((1, 1, h, w), np.float32)
    dim = np.log(np.full((1, 3, h, w), 2.0, np.float32))
    rots = np.zeros((1, 1, h, w), np.float32)
    rotc = np.ones((1, 1, h, w), np.float32)
    coder = CenterPointBBoxCoder(
        pc_range=[-40, -40, -5, 40, 40, 3], out_size_factor=8,
        voxel_size=[0.1, 0.1], max_num=5, score_threshold=0.5)
    out = coder.decode(heat, rots, rotc, hei, dim, None, reg)[0]
    assert out["bboxes"].shape[0] == 1
    np.testing.assert_allclose(
        out["bboxes"][0, :2], [(5.5) * 0.8 - 40, (3.5) * 0.8 - 40],
        atol=1e-5)
    assert out["labels"][0] == 1
