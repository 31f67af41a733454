"""Independent plain-Python beam search — the differential reference for
``latyas_ray/models/beam_decode.py`` (the treatment the CTC/DB decode
kernels got in tests/_tatr_port.py / _mix_port.py).

Follows the PUBLIC transformers beam-search algorithm structure
(BeamSearchScorer / BeamHypotheses) as readable per-hypothesis loops:
explicit hypothesis lists, per-step sorting of the full k×V candidate
grid, eos retirement from the top 2k, length-penalty normalization at
add time, and both stopping rules.  Shares NOTHING with the engine's
vectorized implementation except the pinned semantics documented in the
engine module.
"""

import math
from typing import List, Tuple


def _log_softmax_row(row) -> List[float]:
    m = max(row)
    exps = [math.exp(x - m) for x in row]
    z = math.log(sum(exps))
    return [(x - m) - z for x in row]


def beam_ref(step_fn, *, vocab_size: int, num_beams: int,
             max_new_tokens: int, bos_id: int, eos_id: int, pad_id: int,
             length_penalty: float = 1.0,
             early_stopping: bool = False) -> List[int]:
    """Single-item beam search; ``step_fn(prefix: list[int]) ->
    list[float]`` logits.  Returns the best token id sequence."""
    k = num_beams
    beams: List[Tuple[float, List[int]]] = [(0.0, [bos_id])]
    finished: List[Tuple[float, List[int]]] = []
    done = False

    for _ in range(max_new_tokens):
        if done:
            break
        # full candidate grid, scored
        cands = []  # (score, flat_index, beam_idx, token)
        for b, (bs, seq) in enumerate(beams):
            logp = _log_softmax_row(step_fn(seq))
            for t in range(vocab_size):
                cands.append((bs + logp[t], b * vocab_size + t, b, t))
        # descending score, ties toward the lower flat index
        cands.sort(key=lambda c: (-c[0], c[1]))
        new_beams: List[Tuple[float, List[int]]] = []
        for score, _, b, tok in cands[: 2 * k]:
            if tok == eos_id:
                full = beams[b][1] + [eos_id]
                finished.append(
                    (score / (len(full) ** length_penalty), full)
                )
            elif len(new_beams) < k:
                new_beams.append((score, beams[b][1] + [tok]))
            if len(new_beams) == k:
                break
        if len(finished) >= k:
            if early_stopping:
                done = True
            else:
                worst = min(f[0] for f in finished)
                cur_len = len(beams[0][1]) + 1
                best_attainable = (
                    new_beams[0][0] / (cur_len ** length_penalty)
                    if new_beams else -math.inf
                )
                if worst >= best_attainable:
                    done = True
        if not done:
            beams = new_beams

    if len(finished) < k:
        for bs, seq in beams:
            finished.append((bs / (len(seq) ** length_penalty), seq))
    # best normalized score; ties toward the earlier-added hypothesis
    best_i = 0
    for j in range(1, len(finished)):
        if finished[j][0] > finished[best_i][0]:
            best_i = j
    return finished[best_i][1]
