"""OCR decode postprocessing: CTC differential vs a verbatim port of the
reference loop; DB postprocess geometry properties on synthetic maps."""

import numpy as np
import pytest

from latyas_ray.models.ocr_decode import (
    CTCLabelDecode, DBPostProcess, _label_components, min_area_rect,
)


# ---- verbatim port of the reference decode loop (CTCLabelDecode.py:127-178)

def _reference_ctc_decode(character, text_index, text_prob,
                          is_remove_duplicate=True):
    result_list = []
    ignored_tokens = [0]
    for batch_idx in range(len(text_index)):
        selection = np.ones(len(text_index[batch_idx]), dtype=bool)
        if is_remove_duplicate:
            selection[1:] = text_index[batch_idx][1:] != text_index[batch_idx][:-1]
        for ignored_token in ignored_tokens:
            selection &= text_index[batch_idx] != ignored_token
        char_list = [character[tid] for tid in text_index[batch_idx][selection]]
        conf_list = text_prob[batch_idx][selection]
        if len(conf_list) == 0:
            conf_list = [0]
        result_list.append(("".join(char_list), float(np.mean(conf_list))))
    return result_list


def test_ctc_decode_matches_reference_port():
    rng = np.random.default_rng(99)
    dec = CTCLabelDecode()
    C = len(dec.character)
    for case in range(300):
        T = int(rng.integers(1, 40))
        preds = rng.random((2, T, C))
        got = dec(preds)
        idx = preds.argmax(axis=2)
        prob = preds.max(axis=2)
        want = _reference_ctc_decode(dec.character, idx, prob)
        assert got == want, case


def test_ctc_blank_only_sequence():
    dec = CTCLabelDecode()
    preds = np.zeros((1, 5, len(dec.character)))
    preds[:, :, 0] = 1.0  # all blanks
    assert dec(preds) == [("", 0.0)]


def test_ctc_space_char():
    dec = CTCLabelDecode(use_space_char=True)
    assert dec.character[-1] == " "


# ------------------------------------------------------- DB postprocess

def test_components_split_and_diagonal():
    bm = np.zeros((10, 10), dtype=bool)
    bm[1, 1] = True
    bm[2, 2] = True  # diagonal neighbor → same component (8-connectivity)
    bm[5:8, 5:8] = True
    comps = _label_components(bm)
    assert sorted(len(c) for c in comps) == [2, 9]


def test_min_area_rect_rotated():
    # points along a 45° strip: min-area rect must be rotated, short side
    # equal to the strip width
    t = np.linspace(0, 20, 41)
    pts = np.concatenate([
        np.column_stack([t, t]),
        np.column_stack([t + 2, t]),
    ])
    _c, size, ang = min_area_rect(pts)
    assert min(size) == pytest.approx(2 / np.sqrt(2), abs=1e-6)
    assert abs(np.tan(ang)) == pytest.approx(1.0, abs=1e-6) or \
        abs(np.tan(ang + np.pi / 2)) == pytest.approx(1.0, abs=1e-6)


def test_db_boxes_cover_blob_and_scale():
    pred = np.zeros((1, 1, 50, 80))
    pred[0, 0, 10:20, 15:55] = 0.9
    pp = DBPostProcess(box_thresh=0.5)
    out = pp({"maps": pred}, [[100, 160, 2.0, 2.0]])
    boxes = out[0]["points"]
    assert len(boxes) == 1
    box = boxes[0]
    # grown box covers the blob (scaled ×2) and stays within the page
    assert box[:, 0].min() <= 30 and box[:, 0].max() >= 110
    assert box[:, 1].min() <= 20 and box[:, 1].max() >= 40
    assert box[:, 0].max() <= 160 and box[:, 1].max() <= 100


def test_db_small_and_low_score_blobs_dropped():
    pred = np.zeros((1, 1, 50, 80))
    pred[0, 0, 5:7, 5:7] = 0.9       # below min_size
    pred[0, 0, 30:40, 30:60] = 0.35  # above thresh but below box_thresh
    pp = DBPostProcess(thresh=0.3, box_thresh=0.7)
    out = pp({"maps": pred}, [[50, 80, 1.0, 1.0]])
    assert out[0]["points"] == []


def test_db_two_blobs_two_boxes():
    pred = np.zeros((1, 1, 60, 100))
    pred[0, 0, 5:15, 5:45] = 0.9
    pred[0, 0, 35:50, 50:95] = 0.9
    pp = DBPostProcess(box_thresh=0.5)
    out = pp({"maps": pred}, [[60, 100, 1.0, 1.0]])
    assert len(out[0]["points"]) == 2


def test_ctc_accepts_head_list():
    # the reference accepts a list of head outputs and decodes the last
    dec = CTCLabelDecode()
    preds = np.zeros((1, 4, len(dec.character)))
    preds[0, :, 0] = 0.6
    preds[0, 1, 11] = 0.9  # 'a'
    assert dec([np.zeros((1, 2, 3)), preds]) == dec(preds) == [("a", 0.9)]


def test_ctc_probless_decode_conf_is_one():
    # reference fills [1] * len(selection) (full T length): an all-blank
    # prob-less decode is ('', 1.0), not ('', 0.0)
    dec = CTCLabelDecode()
    idx = np.array([[0, 0, 0]])
    assert dec.decode(idx, None, is_remove_duplicate=True) == [("", 1.0)]
    idx2 = np.array([[0, 11, 11]])
    assert dec.decode(idx2, None, is_remove_duplicate=True) == [("a", 1.0)]
