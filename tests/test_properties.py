"""Property-based tests (hypothesis) for the pure URL/scheduling
functions — invariants the reference's semantics imply, checked over
generated inputs rather than goldens."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from nutch_spark.functions.urls import (
    accept_url,
    choose_repr,
    get_domain,
    get_host,
    normalize_url,
)
from nutch_spark.functions.urlplugins import RegexNormalizer

_HOST_LABEL = st.text(
    alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=8
)
_HOSTS = st.lists(_HOST_LABEL, min_size=1, max_size=4).map(".".join)
_PATH_SEG = st.text(
    alphabet=string.ascii_letters + string.digits + "._-~%",
    min_size=0,
    max_size=10,
)
_PATHS = st.lists(_PATH_SEG, min_size=0, max_size=5).map(
    lambda segs: "/" + "/".join(segs)
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Http"]))
    host = draw(_HOSTS)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080", ":080"]))
    path = draw(_PATHS)
    frag = draw(st.sampled_from(["", "#x", "#frag?y"]))
    return f"{scheme}://{host}{port}{path}{frag}"


@given(urls())
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent(u):
    """normalize(normalize(u)) == normalize(u) — the fixed-point
    property every normalizer chain relies on."""
    n = normalize_url(u)
    if n is not None and n != "":
        assert normalize_url(n) == n


@given(urls())
@settings(max_examples=300, deadline=None)
def test_normalize_never_raises_and_lowercases(u):
    n = normalize_url(u)
    if n:
        scheme, _, rest = n.partition("://")
        assert scheme == scheme.lower()
        host = rest.split("/")[0].split(":")[0]
        assert host == host.lower()
        assert "#" not in n  # fragment always dropped


@given(urls(), urls(), st.booleans())
@settings(max_examples=200, deadline=None)
def test_choose_repr_returns_one_of_inputs(src, dst, temp):
    """chooseRepr always returns src or dst (URLUtil.java:325-417)."""
    assert choose_repr(src, dst, temp) in (src, dst)


@given(urls())
@settings(max_examples=200, deadline=None)
def test_regex_normalizer_idempotent_on_clean(u):
    """The rewrite rule table reaches a fixed point within two passes
    for URLs with no session markers."""
    rn = RegexNormalizer()
    once = rn(u)
    assert rn(once) == rn(once and rn(once))


@given(_HOSTS)
@settings(max_examples=200, deadline=None)
def test_get_domain_is_suffix_of_host(host):
    d = get_domain(host)
    assert d is not None
    assert host == d or host.endswith("." + d)


@given(urls())
@settings(max_examples=200, deadline=None)
def test_accept_url_total(u):
    """Filter decision is total (never raises) over arbitrary URLs."""
    assert accept_url(u) in (True, False)
    assert get_host(u) is None or isinstance(get_host(u), str)


def test_bloom_no_false_negatives():
    """Every inserted key probes positive — the bloom guarantee the
    frontier relies on (false positives allowed, negatives never)."""
    import numpy as np

    from nutch_spark.operators.seen import _build_bitset, _contains

    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    m_bits, k = 8 * 8192, 7
    bs = _build_bitset(keys, m_bits, k)
    assert bool(_contains(bs, keys, m_bits, k).all())


@settings(max_examples=60, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=400
    ),
    shape=st.sampled_from([(8, 2), (64, 2), (256, 4), (16, 4)]),
)
def test_cuckoo_placement_property(keys, shape):
    """Pure-NumPy cuckoo placement kernel, over arbitrary int64 keys
    and table shapes: (1) placement == the pure-Python replay of the
    SQL oracle's window program (stored fingerprints AND stash), and
    (2) every inserted key probes positive (slot match or stash)."""
    import numpy as np

    from nutch_spark.operators.seen import CuckooSeenFilter
    from tests.test_operators import _replay_cuckoo

    m, slots = shape
    cf = CuckooSeenFilter(n_shards=1, m_indexes=m, slots=slots)
    h = np.unique(np.array(keys, dtype=np.int64))
    table = np.zeros((m, slots), dtype=np.uint16)
    stash: list[int] = []
    cf._place(h, table, stash)

    stored_e = {
        (0, int(i), int(table[i, s])) for i, s in zip(*np.nonzero(table))
    }
    stash_e = {(0, int(x)) for x in stash}
    stored_p, stash_p = _replay_cuckoo(
        [int(x) for x in h], 1, m, slots
    )
    # shard of every key is 0 here (n_shards=1) — replay agrees
    assert stored_e == stored_p
    assert stash_e == stash_p
    if len(h):
        hits = cf._probe(
            table.tobytes(), np.asarray(stash, dtype=np.int64).tobytes(), h
        )
        assert bool(hits.all())
