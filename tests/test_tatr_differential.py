"""Differential fuzz of the TATR cell-assembly re-expression
(:mod:`latyas_ray.functions.tsr_assemble`) against the verbatim-structure
port of the reference flow (:mod:`tests._tatr_port`) on synthetic
detection fixtures — same mechanism as the xy-cut/overlap/to_katex
differentials.

Compared per fixture: number of tables, and per table the full cell list
(row_nums, column_nums, header flags, cell text, bbox) plus confidence,
plus byte-identical CSV/HTML through the existing serializers.
"""

import math

import pytest

import _tatr_port as port
from latyas_ray.functions import tsr_assemble as eng
from latyas_ray.functions.tsr import cells_to_csv, cells_to_html
from latyas_ray.functions.tsr_fixtures import synth_detection_fixture

N_CASES = 400


def _canon(cells):
    out = []
    for c in cells:
        out.append({
            "rows": sorted(c["row_nums"]),
            "cols": sorted(c["column_nums"]),
            "header": bool(c["column header"]),
            "proj": bool(c.get("projected row header", False)),
            "text": c["cell text"],
            "bbox": [round(float(v), 6) for v in c["bbox"]],
        })
    return sorted(out, key=lambda c: (c["rows"], c["cols"]))


def _run_port(objects, tokens):
    structures = port.objects_to_structures(
        objects, tokens, port.structure_class_thresholds
    )
    return [port.structure_to_cells(s, tokens) for s in structures]


@pytest.mark.parametrize("chunk", range(8))
def test_assembly_matches_reference_port(chunk):
    for seed in range(chunk * N_CASES // 8, (chunk + 1) * N_CASES // 8):
        obj_a, tok_a, _ = synth_detection_fixture(seed)
        obj_b, tok_b, _ = synth_detection_fixture(seed)

        got = eng.assemble_tables(obj_a, tok_a)
        want = _run_port(obj_b, tok_b)

        assert len(got) == len(want), f"seed {seed}: table count"
        for t, ((gc, gconf), (wc, wconf)) in enumerate(zip(got, want)):
            a, b = _canon(gc), _canon(wc)
            assert a == b, f"seed {seed} table {t}: cells diverge\n{a}\nvs\n{b}"
            assert math.isclose(gconf, wconf, rel_tol=0, abs_tol=1e-9), (
                f"seed {seed} table {t}: confidence {gconf} vs {wconf}"
            )
            if gc:
                assert cells_to_csv(gc) == cells_to_csv(wc), f"seed {seed} csv"
                assert cells_to_html(gc) == cells_to_html(wc), f"seed {seed} html"


def test_outputs_to_objects_shapes():
    """DETR-head decode: softmax/argmax/cxcywh→xyxy on a hand-built raw
    output; 'no object' queries dropped."""
    import numpy as np

    logits = np.full((1, 3, 7), -10.0)
    logits[0, 0, 2] = 5.0   # table row
    logits[0, 1, 6] = 5.0   # no object → dropped
    logits[0, 2, 0] = 5.0   # table
    boxes = np.array([[[0.5, 0.5, 0.5, 0.25],
                       [0.1, 0.1, 0.1, 0.1],
                       [0.5, 0.5, 1.0, 1.0]]])
    objs = eng.outputs_to_objects(logits, boxes, (200, 100))
    assert [o["label"] for o in objs] == ["table row", "table"]
    assert objs[0]["bbox"] == [50.0, 37.5, 150.0, 62.5]
    assert objs[1]["bbox"] == [0.0, 0.0, 200.0, 100.0]
    assert all(o["score"] > 0.99 for o in objs)
