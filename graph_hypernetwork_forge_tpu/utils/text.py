"""Host-side text tokenization (char-level, ASCII-clamped).

Mirrors the reference tokenizer semantics (``models/hypergnn.py:66-71``):
each character → ``min(ord(c), 127)``; the empty string → single code 0.
Vectorized into a padded ``[U, L]`` matrix + lengths for the jitted encoder
(the reference loops per string on the host each forward call).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from graph_hypernetwork_forge_tpu.utils.shapes import pad_bucket_textlen

ASCII_VOCAB = 128  # printable ASCII range; codes clamped to [0, 127]


def tokenize_texts(
    texts: Sequence[str], pad_multiple: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize → (``char_ids [U, L]`` int32, ``lengths [U]`` int32).

    ``L`` is the max length padded up to ``pad_multiple`` for shape
    stability; padded positions hold code 0 and are masked out by length.
    Uses the native C++ batch tokenizer when available
    (``native/ghf_native.cpp``).
    """
    from graph_hypernetwork_forge_tpu.native_bridge import get_native

    native = get_native()
    if native is not None:
        return native.tokenize_batch(list(texts), int(pad_multiple))

    codes: List[List[int]] = []
    for t in texts:
        c = [min(ord(ch), ASCII_VOCAB - 1) for ch in t]
        codes.append(c if c else [0])
    lengths = np.asarray([len(c) for c in codes], dtype=np.int32)
    max_len = pad_bucket_textlen(int(lengths.max()) if len(codes) else 1)
    char_ids = np.zeros((len(codes), max_len), dtype=np.int32)
    for i, c in enumerate(codes):
        char_ids[i, : len(c)] = c
    return char_ids, lengths
