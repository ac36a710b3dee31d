"""Property-based tests (hypothesis) for the URL identity layer.

Canonicalization must be IDEMPOTENT (canon ∘ canon == canon) — the
frontier re-canonicalizes on every admission, so a non-idempotent rule
would change fingerprints across waves and break the seen-set. Also
pinned: golden-model agreement on arbitrary URL-ish strings, and
fingerprint determinism/sensitivity.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from spider_spark.functions.urls import canonicalize_series
from tests import golden_model as G

scheme = st.sampled_from(["http", "https", "HTTP", "Https"])
host = st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.-]{0,20}", fullmatch=True)
port = st.sampled_from(["", ":80", ":443", ":8080"])
path = st.from_regex(r"(/[A-Za-z0-9._~%/-]{0,15}){0,3}", fullmatch=True)
query = st.sampled_from(
    ["", "?b=2&a=1", "?a=1&a=0", "?x=", "?k=v&k=v", "?z=9&y=8&x=7"]
)
frag = st.sampled_from(["", "#f", "#frag-with-stuff"])


@st.composite
def urls(draw):
    return (
        draw(scheme) + "://" + draw(host) + draw(port) + draw(path)
        + draw(query) + draw(frag)
    )


@given(st.lists(urls(), min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_canonicalize_idempotent(batch):
    once = canonicalize_series(pd.Series(batch))
    twice = canonicalize_series(once)
    assert once.tolist() == twice.tolist()


@given(st.lists(urls(), min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_canonicalize_matches_golden_model(batch):
    vec = canonicalize_series(pd.Series(batch)).tolist()
    ref = [G.canonicalize(u) for u in batch]
    assert vec == ref


@given(st.lists(urls(), min_size=2, max_size=20))
@settings(max_examples=40, deadline=None)
def test_fingerprint_deterministic_and_method_sensitive(batch):
    canon = canonicalize_series(pd.Series(batch)).tolist()
    get1 = [G.fingerprint("GET", u, None) for u in canon]
    get2 = [G.fingerprint("GET", u, None) for u in canon]
    post = [G.fingerprint("POST", u, "a=1") for u in canon]
    assert get1 == get2
    assert all(g != p for g, p in zip(get1, post))


def test_arrow_and_pandas_paths_agree():
    from spider_spark.functions.urls import _canonicalize_arrow, _canonicalize_pandas

    cases = pd.Series(
        [
            "HTTP://Host.Example:80/a//b?z=1&a=2#frag",
            "https://h.example:443/",
            "h.example/no-scheme",
            "",
            "http://h.example/p?b=&a=1",
            "ftp://H.EXAMPLE:21/x",
            "http://h.example/p?a=1&a=0#x",
        ]
    )
    assert _canonicalize_arrow(cases).tolist() == _canonicalize_pandas(cases).tolist()
