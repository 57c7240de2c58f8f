"""Native C++ graph-builder: equivalence with the pure-Python path."""

import numpy as np
import pytest

from graph_hypernetwork_forge_tpu.native_bridge import get_native, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native extension not built"
)


def py_tokenize(texts):
    codes = []
    for t in texts:
        c = [min(ord(ch), 127) for ch in t]
        codes.append(c if c else [0])
    return codes


class TestNativeDedup:
    def test_matches_python(self):
        texts = ["b", "a", "b", "c", "a", "", "b"]
        native = get_native()
        uniq, ids = native.dedup_and_ids(texts)
        assert uniq == ["b", "a", "c", ""]
        assert ids.tolist() == [0, 1, 0, 2, 1, 3, 0]
        assert ids.dtype == np.int32

    def test_unicode(self):
        native = get_native()
        uniq, ids = native.dedup_and_ids(["中文", "中文", "ascii"])
        assert uniq == ["中文", "ascii"]
        assert ids.tolist() == [0, 0, 1]

    def test_large_random(self):
        rng = np.random.default_rng(0)
        texts = [f"rel {i}" for i in rng.integers(0, 50, size=5000)]
        native = get_native()
        uniq, ids = native.dedup_and_ids(texts)
        # Python oracle
        want_uniq = list(dict.fromkeys(texts))
        assert uniq == want_uniq
        lookup = {t: i for i, t in enumerate(want_uniq)}
        assert ids.tolist() == [lookup[t] for t in texts]


class TestNativeTokenize:
    def test_matches_python_semantics(self):
        texts = ["knows", "", "résumé 中文", "a" * 37]
        native = get_native()
        cids, lens = native.tokenize_batch(texts, 8)
        want = py_tokenize(texts)
        assert lens.tolist() == [len(c) for c in want]
        assert cids.shape[1] % 8 == 0
        for i, c in enumerate(want):
            assert cids[i, : len(c)].tolist() == c
            assert (cids[i, len(c):] == 0).all()


class TestNativeCsr:
    def test_matches_argsort(self):
        rng = np.random.default_rng(1)
        dst = rng.integers(0, 20, size=200).astype(np.int64)
        native = get_native()
        ptr, eid = native.build_csr(dst, 20)
        assert ptr[-1] == 200
        for v in range(20):
            seg = eid[ptr[v] : ptr[v + 1]]
            assert (dst[seg] == v).all()
            # stability: edge ids ascending within a segment
            assert (np.diff(seg) > 0).all() or len(seg) <= 1

    def test_out_of_range_raises(self):
        native = get_native()
        with pytest.raises(ValueError):
            native.build_csr(np.asarray([0, 5], dtype=np.int64), 3)


class TestNativeSort:
    def test_stable_by_relation(self):
        rng = np.random.default_rng(2)
        rel = rng.integers(0, 7, size=500).astype(np.int32)
        native = get_native()
        order = native.sort_by_relation(rel, 7)
        srt = rel[order]
        assert (np.diff(srt) >= 0).all()
        # stability
        want = np.argsort(rel, kind="stable")
        assert order.tolist() == want.tolist()
