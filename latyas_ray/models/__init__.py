"""Model-facing contracts and pure-numpy model-adjacent kernels.

- :mod:`.ocr_protocol` — the executable OCR backend protocol
  (``OCRModel`` ABC, registry + per-kind rule table, two registered
  deterministic backends) mirroring the reference's
  ``ocr/models/ocr_model.py:24-34`` + ``pipelines/base_pipeline.py:83-92``.
- :mod:`.det_preprocess` — the detector preprocessing compose
  (Resize / NormalizeImage / Permute / PadStride / LetterBoxResize / Pad)
  re-expressed in pure numpy, mirroring
  ``layout/models/texteller/det_model/preprocess.py:29-502``.
"""

from .ocr_protocol import (  # noqa: F401
    DigestOCRModel,
    EchoOCRModel,
    OCRModel,
    OCRRegistry,
    TextBoundingBox,
    default_registry,
)
