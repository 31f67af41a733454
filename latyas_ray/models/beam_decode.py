"""Batched beam-search generation — the decode semantics behind the
TexTeller OCR slot (A6).

The reference's recognizer stacks every crop into ONE ``generate`` call
with ``GenerationConfig(num_beams, do_sample=False, max_new_tokens,
bos/eos/pad)`` and batch-decodes the result
(``/root/reference/latyas/tex_ocr/models/texteller/ocr_model/utils/
inference.py:13-49``).  The beam internals live in the public
``transformers`` generation code, not in the reference repo, so this
module re-expresses the PUBLIC algorithm (beam search with 2k candidate
expansion, eos-finished hypotheses, length-penalty normalization, the
``early_stopping=False`` best-attainable-score stopping heuristic) with
pinned semantics, and is differential-tested against an independent
plain-Python reference implementation (``tests/_beam_port.py``) the way
the CTC/DB decode kernels are (``models/ocr_decode.py``).

Pinned semantics (each is a real degree of freedom across beam-search
implementations — the differential fuzz covers all of them):

- log-probabilities are float64 ``log_softmax`` of the step logits;
- a hypothesis's normalized score is ``sum_logprobs / len**length_penalty``
  with ``len`` the FULL sequence length including bos and eos (the
  ``input_ids.shape[-1]`` convention);
- each step expands the top ``2k`` of the ``k × vocab`` candidate grid;
  eos-candidates retire to the finished pool (only from the top ``2k``),
  non-eos candidates fill the next ``k`` beam slots in order;
- ties break toward the LOWER flat candidate index (beam-major, then
  token id) — fully deterministic;
- ``early_stopping=True`` stops an item once ``k`` hypotheses finished;
  ``early_stopping=False`` stops when the worst finished normalized
  score already beats ``best_running_sum / cur_len**length_penalty``
  (the heuristic's pessimistic best-attainable estimate at the CURRENT
  length);
- items exhausting ``max_new_tokens`` promote their running beams into
  the finished pool (same normalization) before the final pick.

``num_beams=1`` degenerates to exact greedy argmax decoding.
"""

from __future__ import annotations

import hashlib
from typing import Callable, List, Tuple

import numpy as np

from .ocr_protocol import OCRModel

Step = Callable[[np.ndarray], np.ndarray]  # (rows, t) int64 -> (rows, V)


def _log_softmax(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float64)
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return (x - m) - np.log(e.sum(axis=-1, keepdims=True))


def beam_generate(step_fn: Step, batch_size: int, *, vocab_size: int,
                  num_beams: int, max_new_tokens: int, bos_id: int,
                  eos_id: int, pad_id: int, length_penalty: float = 1.0,
                  early_stopping: bool = False) -> np.ndarray:
    """Generate for ``batch_size`` items at once (the stacked-call shape
    the reference's ``inference.py`` contract requires): returns an
    int64 array (batch, L) right-padded with ``pad_id``; every row
    starts with ``bos_id`` and, when finished naturally, ends its
    content with ``eos_id``."""
    k = int(num_beams)
    n = int(batch_size)
    v = int(vocab_size)
    seq = np.full((n, k, 1), bos_id, dtype=np.int64)
    scores = np.full((n, k), -np.inf, dtype=np.float64)
    scores[:, 0] = 0.0
    finished: List[List[Tuple[float, np.ndarray]]] = [[] for _ in range(n)]
    done = np.zeros(n, dtype=bool)

    for _ in range(max_new_tokens):
        if done.all():
            break
        logp = _log_softmax(step_fn(seq.reshape(n * k, -1)))
        cand = (scores[:, :, None] + logp.reshape(n, k, v)).reshape(n, k * v)
        # top 2k per item, score-descending, ties toward lower flat index
        top = min(2 * k, k * v)
        idx = np.argpartition(-cand, top - 1, axis=1)[:, :top]
        ordered = np.take_along_axis(cand, idx, axis=1)
        # stable two-key sort: primary -score, secondary flat index
        order = np.lexsort((idx, -ordered), axis=1)
        idx = np.take_along_axis(idx, order, axis=1)
        ordered = np.take_along_axis(ordered, order, axis=1)

        cur_len = seq.shape[2] + 1  # length after appending this token
        new_seq = np.full((n, k, cur_len), pad_id, dtype=np.int64)
        new_scores = np.full((n, k), -np.inf, dtype=np.float64)
        for i in range(n):
            if done[i]:
                new_seq[i, :, :-1] = seq[i]
                new_scores[i] = scores[i]
                continue
            slot = 0
            for c in range(top):
                b, tok = divmod(int(idx[i, c]), v)
                s = float(ordered[i, c])
                if tok == eos_id:
                    full = np.concatenate((seq[i, b], [eos_id]))
                    finished[i].append(
                        (s / (len(full) ** length_penalty), full)
                    )
                elif slot < k:
                    new_seq[i, slot, :-1] = seq[i, b]
                    new_seq[i, slot, -1] = tok
                    new_scores[i, slot] = s
                    slot += 1
                if slot == k:
                    break
            # stopping rule
            if len(finished[i]) >= k:
                if early_stopping:
                    done[i] = True
                else:
                    worst = min(f[0] for f in finished[i])
                    best_attainable = (
                        new_scores[i, 0] / (cur_len ** length_penalty)
                        if np.isfinite(new_scores[i, 0]) else -np.inf
                    )
                    if worst >= best_attainable:
                        done[i] = True
            if done[i]:
                # freeze beams (content no longer extends)
                new_seq[i, :, :-1] = seq[i]
                new_seq[i, :, -1] = pad_id
                new_scores[i] = scores[i]
        seq, scores = new_seq, new_scores

    # promote running beams for items that never collected k finished
    outs = []
    for i in range(n):
        pool = list(finished[i])
        if len(pool) < k:
            for b in range(k):
                if np.isfinite(scores[i, b]):
                    row = seq[i, b]
                    row = row[row != pad_id] if done[i] else row
                    pool.append(
                        (float(scores[i, b]) / (len(row) ** length_penalty),
                         np.asarray(row, dtype=np.int64))
                    )
        # best normalized score; ties toward the earlier-added hypothesis
        best = max(range(len(pool)), key=lambda j: (pool[j][0], -j))
        outs.append(pool[best][1])
    width = max(len(o) for o in outs)
    res = np.full((n, width), pad_id, dtype=np.int64)
    for i, o in enumerate(outs):
        res[i, :len(o)] = o
    return res


# ------------------------------------------------- deterministic stub LM

# LaTeX-ish output vocabulary for the stub recognizer: ids 0-3 are
# special (pad/bos/eos/unk mirroring the RobertaTokenizerFast layout the
# reference loads); the rest decode to tokens so the joined string looks
# like the slot's real output domain.
STUB_PAD, STUB_BOS, STUB_EOS, STUB_UNK = 0, 1, 2, 3
STUB_TOKENS = [
    "<pad>", "<s>", "</s>", "<unk>",
    "\\alpha", "\\beta", "x", "y", "+", "-", "=", "^{2}", "_{i}",
    "\\frac", "{", "}", "(", ")", "\\sum", "\\int",
]
STUB_VOCAB = len(STUB_TOKENS)
_MIX = np.uint64(0x9E3779B97F4A7C15)


class TexBeamOCRModel(OCRModel):
    """TexTeller-slot backend with the REAL batched-generate contract:
    ``recognize_batch`` stacks every crop into ONE ``beam_generate``
    call (the ``inference.py:13-49`` shape — ``torch.stack`` →
    ``generate(num_beams, do_sample=False)`` → ``batch_decode``) over
    the deterministic stub encoder-decoder; a real TexTeller drops in
    by replacing :class:`StubSeq2Seq` with the HF model, everything
    else unchanged.  Registered like any :class:`OCRModel` backend."""

    name = "texteller_beam/1"

    def __init__(self, num_beams: int = 3, max_new_tokens: int = 12,
                 length_penalty: float = 1.0,
                 early_stopping: bool = False) -> None:
        self.num_beams = num_beams
        self.max_new_tokens = max_new_tokens
        self.length_penalty = length_penalty
        self.early_stopping = early_stopping

    @staticmethod
    def _payload(image) -> bytes:
        if isinstance(image, bytes):
            return image
        if isinstance(image, str):
            return image.encode("utf-8")
        if isinstance(image, (bytearray, memoryview)):
            return bytes(image)
        if isinstance(image, list):  # TexMix token-list crops
            return " ".join(
                getattr(t, "text", str(t)) for t in image
            ).encode("utf-8")
        return repr(image).encode("utf-8")

    @staticmethod
    def _decode(row: np.ndarray) -> str:
        # batch_decode(skip_special_tokens=True) semantics
        toks = [
            STUB_TOKENS[int(t)] for t in row
            if int(t) not in (STUB_PAD, STUB_BOS, STUB_EOS, STUB_UNK)
        ]
        return " ".join(toks)

    def recognize_batch(self, images) -> List[str]:
        if not images:
            return []
        model = StubSeq2Seq([self._payload(im) for im in images])
        ids = beam_generate(
            model.step, len(images), vocab_size=STUB_VOCAB,
            num_beams=self.num_beams, max_new_tokens=self.max_new_tokens,
            bos_id=STUB_BOS, eos_id=STUB_EOS, pad_id=STUB_PAD,
            length_penalty=self.length_penalty,
            early_stopping=self.early_stopping,
        )
        return [self._decode(ids[i]) for i in range(len(images))]

    def recognize(self, image) -> str:
        return self.recognize_batch([image])[0]

    def detect(self, image):
        from .ocr_protocol import TextBoundingBox

        return [
            TextBoundingBox(0.0, 0.0, 64.0, 16.0, self.recognize(image))
        ]


class StubSeq2Seq:
    """Deterministic stand-in for the TexTeller encoder-decoder: the
    "encoder state" is a blake2b digest of the image payload, the
    "decoder" emits logits as a hash mix of (state, rolling prefix
    hash, token id).  Fully vectorized across rows; same bytes → same
    logits on every process, so beam search over it is reproducible and
    non-trivial (prefix-dependent logits reorder beams)."""

    def __init__(self, payloads: List[bytes]):
        self._state = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(p, digest_size=8).digest(), "little"
                )
                for p in payloads
            ],
            dtype=np.uint64,
        )

    def step(self, prefix: np.ndarray) -> np.ndarray:
        rows = prefix.shape[0]
        beams = rows // len(self._state)
        state = np.repeat(self._state, beams)
        with np.errstate(over="ignore"):
            h = state.copy()
            for t in range(prefix.shape[1]):
                h = (h ^ prefix[:, t].astype(np.uint64)) * _MIX
            grid = (
                h[:, None] ^ (np.arange(STUB_VOCAB, dtype=np.uint64)
                              * np.uint64(0xFF51AFD7ED558CCD))[None, :]
            ) * _MIX
        logits = (grid >> np.uint64(40)).astype(np.float64) / (1 << 20)
        logits[:, STUB_PAD] = -1e9  # never emit pad/bos mid-sequence
        logits[:, STUB_BOS] = -1e9
        return logits
