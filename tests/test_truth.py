from __future__ import annotations

from entity_extractor_spark.operators.truth import (
    PPM,
    TRUST0_PPM,
    source_trust,
    truth_discovery,
)

CLAIMS = [
    # key k1: A and B say x, C says y
    ("A", "k1", "x"),
    ("B", "k1", "x"),
    ("C", "k1", "y"),
    # key k2: A and B say p, C says q
    ("A", "k2", "p"),
    ("B", "k2", "p"),
    ("C", "k2", "q"),
    # key k3: symmetric tie between A and B -> value-asc tiebreak
    ("A", "k3", "zz"),
    ("B", "k3", "aa"),
    # duplicate claim rows must not double-count
    ("A", "k1", "x"),
]


def _replay(claims: list[tuple[str, str, str]], rounds: int):
    """Pure-Python replay of the fixed-point loop (exact integers)."""
    c = sorted(set(claims))
    sources = sorted({s for s, _, _ in c})
    trust = {s: TRUST0_PPM for s in sources}
    conf: dict[tuple[str, str], int] = {}
    for _ in range(rounds):
        belief: dict[tuple[str, str], int] = {}
        for s, k, v in c:
            belief[(k, v)] = belief.get((k, v), 0) + trust[s]
        tot: dict[str, int] = {}
        for (k, _), b in belief.items():
            tot[k] = tot.get(k, 0) + b
        conf = {(k, v): b * PPM // tot[k] for (k, v), b in belief.items()}
        acc: dict[str, list[int]] = {s: [] for s in sources}
        for s, k, v in c:
            acc[s].append(conf[(k, v)])
        trust = {s: sum(xs) // len(xs) for s, xs in acc.items()}
    return conf, trust


def test_truth_discovery_matches_python_replay(spark):
    df = spark.createDataFrame(CLAIMS, ["source", "claim_key", "claim_value"])
    got = {
        (r.claim_key): (r.claim_value, r.conf_ppm, r.n_sources)
        for r in truth_discovery(df, rounds=2).collect()
    }
    conf, _ = _replay(CLAIMS, rounds=2)
    # winners: per key the max conf, tiebreak value asc
    keys = {k for k, _ in conf}
    want = {}
    n_sources = {}
    for s, k, v in set(CLAIMS):
        n_sources[(k, v)] = n_sources.get((k, v), 0) + 1
    for k in keys:
        cands = sorted(
            ((c, v) for (kk, v), c in conf.items() if kk == k),
            key=lambda t: (-t[0], t[1]),
        )
        c, v = cands[0]
        want[k] = (v, c, n_sources[(k, v)])
    assert got == want
    # hand-checked anchors
    assert got["k1"][0] == "x" and got["k2"][0] == "p"
    assert got["k3"] == ("aa", 500_000, 1)  # symmetric tie -> value asc


def test_source_trust_matches_python_replay(spark):
    df = spark.createDataFrame(CLAIMS, ["source", "claim_key", "claim_value"])
    got = {r.source: (r.trust_ppm, r.n_claims) for r in source_trust(df, rounds=2).collect()}
    _, trust = _replay(CLAIMS, rounds=2)
    n_claims = {}
    for s, _, _ in set(CLAIMS):
        n_claims[s] = n_claims.get(s, 0) + 1
    assert got == {s: (t, n_claims[s]) for s, t in trust.items()}
    # the majority-agreeing sources rise above init, the contrarian sinks
    assert got["A"][0] > TRUST0_PPM > got["C"][0]
    assert got["A"][0] == got["B"][0]  # symmetric claim sets stay symmetric
