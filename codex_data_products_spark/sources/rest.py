"""REST search/entity fetch with retry + 303-redirect handling — S8/S9.

The reference POSTs an Elasticsearch bool-query to the public search
endpoint and handles three outcomes (make_uuids_tsv.py:37-59): 200 →
parse hits; 303 → the response BODY carries a redirect URL to GET;
anything else → empty result. This module reproduces that contract as
a driver-side boundary with two production hardenings the reference
lacks:

  * bounded retry with deterministic exponential backoff on transient
    failures (5xx and transport errors) — a nightly 100 TB pipeline
    cannot fall over on one gateway hiccup;
  * an injectable transport (callables returning (status, text)), so
    tests drive every branch with recorded fixtures and zero network,
    and the default transport is stdlib urllib (no extra deps).

Fetch output is a list of raw hit-JSON strings — the exact input
``plans.catalog.parse_hits`` ingests, keeping the network boundary a
pure string producer and everything after it a Spark plan.
"""

from __future__ import annotations

import json
from collections.abc import Callable

# transport: (url, json_payload_or_None) -> (status_code, body_text)
Transport = Callable[[str, dict | None], tuple[int, str]]

MAX_RETRIES = 3
RETRYABLE_MIN_STATUS = 500


def urllib_transport(url: str, payload: dict | None) -> tuple[int, str]:
    """Default stdlib transport: POST json when a payload is given,
    else GET. Returns (status, text); never raises on HTTP errors."""
    import urllib.error
    import urllib.request

    data = None
    headers = {}
    if payload is not None:
        data = json.dumps(payload).encode()
        headers["Content-Type"] = "application/json"
    req = urllib.request.Request(url, data=data, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:  # non-2xx with a response
        return e.code, e.read().decode()


def fetch_json(
    url: str,
    payload: dict | None = None,
    transport: Transport = urllib_transport,
    max_retries: int = MAX_RETRIES,
    sleeper: Callable[[float], None] | None = None,
) -> tuple[int, str]:
    """One logical fetch: retries transient failures (transport
    exceptions and >=500 statuses) with 1s/2s/4s… backoff, then
    follows at most one 303 whose BODY is the redirect URL
    (make_uuids_tsv.py:45-55 semantics)."""
    if sleeper is None:
        import time

        sleeper = time.sleep

    def attempt_with_retry(u: str, p: dict | None) -> tuple[int, str]:
        last: tuple[int, str] = (0, "no attempt made")
        for i in range(max_retries):
            try:
                status, text = transport(u, p)
            except Exception as e:  # transport-level failure
                last = (0, f"transport error: {e}")
            else:
                if status < RETRYABLE_MIN_STATUS:
                    return status, text
                last = (status, text)
            if i < max_retries - 1:
                sleeper(float(1 << i))
        return last

    status, text = attempt_with_retry(url, payload)
    if status == 303:
        redirect_url = text.strip()
        status, text = attempt_with_retry(redirect_url, None)
    return status, text


def search_hits(
    url: str,
    query_payload: dict,
    transport: Transport = urllib_transport,
    max_retries: int = MAX_RETRIES,
    sleeper: Callable[[float], None] | None = None,
) -> list[str]:
    """POST the ES query; return raw hit JSON strings (one per
    dataset) for ``plans.catalog.parse_hits``. Errors after retries →
    empty list, matching the reference's empty-result contract."""
    status, text = fetch_json(
        url, query_payload, transport, max_retries, sleeper
    )
    if status != 200:
        return []
    data = json.loads(text)
    return [
        json.dumps(hit) for hit in data.get("hits", {}).get("hits", [])
    ]


def codex_search_payload(
    organ_code: str | None = None, size: int = 10000
) -> dict:
    """The reference's bool query (make_uuids_tsv.py:15-34): public
    CODEX datasets with no next revision, optionally organ-scoped."""
    must = [
        {"match": {"dataset_type": "CODEX"}},
        {"match": {"data_access_level": "public"}},
    ]
    if organ_code is not None:
        must.append({"match": {"origin_samples.organ": organ_code}})
    return {
        "from": 0,
        "size": size,
        "query": {
            "bool": {
                "must": must,
                "must_not": [{"exists": {"field": "next_revision_uuid"}}],
            }
        },
    }


ENTITY_API_URL = "https://entity.api.hubmapconsortium.org"


def entity_tissue_lookup(
    uuid: str,
    organ_map: dict[str, str],
    base_url: str = ENTITY_API_URL,
    transport: Transport = urllib_transport,
    max_retries: int = MAX_RETRIES,
    sleeper: Callable[[float], None] | None = None,
) -> str | None:
    """S9: the reference's live tissue resolution (get_tissue_type,
    bin/concatenate.py:84-96): GET ``/datasets/{uuid}/samples``, take
    the FIRST sample whose ``direct_ancestor`` carries an organ code,
    and translate it through the organ map
    (``sources.organ_yaml.load_organ_map``). Returns None on HTTP
    failure (after retry), an organ-less sample list, malformed JSON,
    or an organ code missing from the map — the reference raises
    KeyError on the last case; a nightly pipeline degrades to its
    tissue-unresolved path instead."""
    tissue, _definitive = entity_tissue_lookup_ex(
        uuid, organ_map, base_url, transport, max_retries, sleeper
    )
    return tissue


def entity_tissue_lookup_ex(
    uuid: str,
    organ_map: dict[str, str],
    base_url: str = ENTITY_API_URL,
    transport: Transport = urllib_transport,
    max_retries: int = MAX_RETRIES,
    sleeper: Callable[[float], None] | None = None,
) -> tuple[str | None, bool]:
    """``entity_tissue_lookup`` plus a ``definitive`` flag: True when
    the entity API ANSWERED (a parsed sample list — even one with no
    organ, which is a real "this dataset has no tissue" fact), False
    when the answer is unknowable right now (HTTP failure after retry,
    malformed body). Memoizing callers must cache only definitive
    results, so a transient outage doesn't pin a dataset into the
    'unknown' tissue bucket for the lookup's lifetime."""
    status, text = fetch_json(
        f"{base_url}/datasets/{uuid}/samples",
        None,
        transport,
        max_retries,
        sleeper,
    )
    if status != 200:
        return None, False
    try:
        data = json.loads(text)
    except ValueError:
        return None, False
    if not isinstance(data, list):
        return None, False
    for sample in data:
        if not isinstance(sample, dict):
            continue
        organ = (sample.get("direct_ancestor") or {}).get("organ")
        if organ:
            return organ_map.get(organ), True
    return None, True


def live_tissue_lookup(
    organ_yaml_path: str,
    base_url: str = ENTITY_API_URL,
    transport: Transport = urllib_transport,
) -> Callable[[str], str | None]:
    """A ready-to-wire ``tissue_lookup`` for ``plans.codex_pipeline``'s
    build entry points: loads the organ YAML once, memoizes per-uuid
    answers (the fleet build resolves each dataset exactly once even if
    retried), and keeps the network boundary injectable for tests.
    Only DEFINITIVE answers are cached — a transport failure (after
    retries) stays uncached so the next call re-asks the API instead of
    permanently pinning the dataset to the 'unknown' tissue bucket."""
    from codex_data_products_spark.sources.organ_yaml import (
        load_organ_map,
    )

    organ_map = load_organ_map(organ_yaml_path)
    cache: dict[str, str | None] = {}

    def lookup(uuid: str) -> str | None:
        if uuid in cache:
            return cache[uuid]
        tissue, definitive = entity_tissue_lookup_ex(
            uuid, organ_map, base_url, transport
        )
        if definitive:
            cache[uuid] = tissue
        return tissue

    return lookup
