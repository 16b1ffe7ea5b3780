"""Recorded-transport tests for the REST fetch boundary (S8/S9):
retry, 303-redirect-via-body, error-to-empty, and composition into
the catalog hit parser — every branch, zero network."""

from __future__ import annotations

import json

from codex_data_products_spark.sources.rest import (
    codex_search_payload,
    fetch_json,
    search_hits,
)

_HITS_BODY = json.dumps(
    {
        "hits": {
            "hits": [
                {"_source": {"uuid": "u1", "hubmap_id": "HBM1"}},
                {"_source": {"uuid": "u2", "hubmap_id": "HBM2"}},
            ]
        }
    }
)


class RecordedTransport:
    """Replays a scripted list of (status, text) | Exception."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []

    def __call__(self, url, payload):
        self.calls.append((url, payload))
        step = self.script.pop(0)
        if isinstance(step, Exception):
            raise step
        return step


def _no_sleep(s):
    _no_sleep.slept.append(s)


def test_fetch_ok_first_try():
    t = RecordedTransport([(200, "body")])
    assert fetch_json("http://x", {"q": 1}, t, sleeper=lambda s: None) == (
        200,
        "body",
    )
    assert t.calls == [("http://x", {"q": 1})]


def test_fetch_retries_5xx_then_succeeds_with_backoff():
    _no_sleep.slept = []
    t = RecordedTransport([(503, "busy"), (500, "err"), (200, "ok")])
    assert fetch_json("http://x", None, t, sleeper=_no_sleep) == (200, "ok")
    assert len(t.calls) == 3
    assert _no_sleep.slept == [1.0, 2.0]  # deterministic exponential


def test_fetch_retries_transport_exceptions():
    t = RecordedTransport([OSError("reset"), (200, "ok")])
    assert fetch_json("http://x", None, t, sleeper=lambda s: None) == (
        200,
        "ok",
    )


def test_fetch_gives_up_after_max_retries():
    t = RecordedTransport([(500, "a"), (500, "b"), (500, "c")])
    status, text = fetch_json("http://x", None, t, sleeper=lambda s: None)
    assert (status, text) == (500, "c")
    assert t.script == []  # exactly max_retries attempts


def test_fetch_follows_303_body_url_with_get():
    # 303 body IS the redirect URL; the follow-up must be a GET
    # (payload None), per make_uuids_tsv.py:45-55 semantics
    t = RecordedTransport([(303, "http://redirected\n"), (200, "final")])
    assert fetch_json("http://x", {"q": 1}, t, sleeper=lambda s: None) == (
        200,
        "final",
    )
    assert t.calls == [("http://x", {"q": 1}), ("http://redirected", None)]


def test_search_hits_parses_and_serializes_each_hit():
    t = RecordedTransport([(200, _HITS_BODY)])
    hits = search_hits("http://x", codex_search_payload(), t)
    assert [json.loads(h)["_source"]["uuid"] for h in hits] == ["u1", "u2"]


def test_search_hits_error_yields_empty():
    t = RecordedTransport([(404, "nope")])
    assert search_hits("http://x", codex_search_payload(), t) == []


def test_search_hits_feed_parse_hits(spark):
    from codex_data_products_spark.plans.catalog import parse_hits

    src = {
        "uuid": "u1",
        "hubmap_id": "HBM1",
        "dataset_type": "CODEX",
        "data_access_level": "public",
    }
    t = RecordedTransport(
        [(303, "http://r"), (200, json.dumps({"hits": {"hits": [{"_source": src}]}}))]
    )
    hits = search_hits("http://x", codex_search_payload("HT"), t)
    rows = parse_hits(spark, hits).select("uuid", "hubmap_id").collect()
    assert [(r["uuid"], r["hubmap_id"]) for r in rows] == [("u1", "HBM1")]


def test_codex_search_payload_shapes():
    base = codex_search_payload()
    assert base["query"]["bool"]["must_not"] == [
        {"exists": {"field": "next_revision_uuid"}}
    ]
    assert len(base["query"]["bool"]["must"]) == 2
    scoped = codex_search_payload("HT")
    assert {"match": {"origin_samples.organ": "HT"}} in scoped["query"][
        "bool"
    ]["must"]


# ---------------------------------------------------------------------------
# S9: live tissue resolution (entity_tissue_lookup — the reference's
# get_tissue_type, bin/concatenate.py:84-96) — found / missing-organ /
# HTTP-error branches on recorded transports.
# ---------------------------------------------------------------------------

_ORGAN_MAP = {"HT": "Heart", "LK": "Kidney (Left)"}


def _samples_body(*organs):
    return json.dumps(
        [
            {"direct_ancestor": ({"organ": o} if o else {})}
            for o in organs
        ]
    )


def test_tissue_lookup_found():
    from codex_data_products_spark.sources.rest import entity_tissue_lookup

    t = RecordedTransport([(200, _samples_body(None, "HT", "LK"))])
    # first sample has no organ; the first WITH one wins (reference
    # iterates samples and returns on the first organ hit)
    assert (
        entity_tissue_lookup("u1", _ORGAN_MAP, "http://api", t) == "Heart"
    )
    assert t.calls == [("http://api/datasets/u1/samples", None)]


def test_tissue_lookup_missing_organ_branches():
    from codex_data_products_spark.sources.rest import entity_tissue_lookup

    # no sample carries an organ → None
    t = RecordedTransport([(200, _samples_body(None, None))])
    assert entity_tissue_lookup("u1", _ORGAN_MAP, "http://api", t) is None
    # organ code absent from the map → None (reference would KeyError)
    t = RecordedTransport([(200, _samples_body("ZZ"))])
    assert entity_tissue_lookup("u1", _ORGAN_MAP, "http://api", t) is None
    # malformed / non-list JSON → None
    t = RecordedTransport([(200, "not json")])
    assert entity_tissue_lookup("u1", _ORGAN_MAP, "http://api", t) is None
    t = RecordedTransport([(200, json.dumps({"oops": 1}))])
    assert entity_tissue_lookup("u1", _ORGAN_MAP, "http://api", t) is None


def test_tissue_lookup_http_error_after_retries():
    from codex_data_products_spark.sources.rest import entity_tissue_lookup

    _no_sleep.slept = []
    t = RecordedTransport([(500, "e"), (502, "e"), (404, "gone")])
    assert (
        entity_tissue_lookup(
            "u1", _ORGAN_MAP, "http://api", t, sleeper=_no_sleep
        )
        is None
    )
    assert _no_sleep.slept == [1.0, 2.0]  # 5xx retried, 404 final


def test_live_tissue_lookup_memoizes(tmp_path):
    from codex_data_products_spark.sources.rest import live_tissue_lookup

    y = tmp_path / "organ_types.yaml"
    y.write_text("HT:\n  description: Heart\nLK:\n  description: Kidney\n")
    t = RecordedTransport(
        [(200, _samples_body("HT")), (200, _samples_body("LK"))]
    )
    lookup = live_tissue_lookup(str(y), "http://api", t)
    assert lookup("u1") == "Heart"
    assert lookup("u1") == "Heart"  # memoized — no second call for u1
    assert lookup("u2") == "Kidney"
    assert [u for u, _ in t.calls] == [
        "http://api/datasets/u1/samples",
        "http://api/datasets/u2/samples",
    ]


def test_live_tissue_lookup_does_not_cache_transport_failure(tmp_path):
    """ADVICE r10: a transient entity-API outage must NOT pin the uuid
    as unresolved for the lookup's lifetime — only definitive answers
    (parsed sample lists) are memoized."""
    from codex_data_products_spark.sources.rest import live_tissue_lookup

    y = tmp_path / "organ_types.yaml"
    y.write_text("HT:\n  description: Heart\n")
    t = RecordedTransport([(404, "gone"), (200, _samples_body("HT"))])
    lookup = live_tissue_lookup(str(y), "http://api", t)
    assert lookup("u1") is None  # outage → unresolved now...
    assert lookup("u1") == "Heart"  # ...but re-asked, not pinned
    assert len(t.calls) == 2


def test_live_tissue_lookup_caches_definitive_none(tmp_path):
    """An organ-less sample list IS an answer: cached, no re-fetch."""
    from codex_data_products_spark.sources.rest import live_tissue_lookup

    y = tmp_path / "organ_types.yaml"
    y.write_text("HT:\n  description: Heart\n")
    t = RecordedTransport([(200, _samples_body(None))])
    lookup = live_tissue_lookup(str(y), "http://api", t)
    assert lookup("u1") is None
    assert lookup("u1") is None  # memoized — script has no 2nd reply
    assert len(t.calls) == 1
