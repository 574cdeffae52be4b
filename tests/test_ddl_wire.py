"""Wire-shape tests for the ArangoDB DDL surface (VERDICT r4 #5): an
in-process stateful HTTP server simulates the existence/creation endpoints
and every request (method, path, body bytes) is recorded, so the
create-or-get sequences of ArangoDbUtilities.java:80-312 are pinned
byte-for-byte — including that a SECOND invocation is pure GETs (idempotent,
no re-create)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from cell_kn_mvp_etl_ontologies_spark.sinks.http_transport import (
    NGRAM_ANALYZER,
    TEXT_NO_STEM_ANALYZER,
    ArangoDdlClient,
)


@pytest.fixture()
def arango_sim():
    """Minimal stateful ArangoDB DDL simulator: databases, graphs with
    vertex/edge collection lists, analyzers, views.  Returns
    (client, requests) where requests is the ordered
    [(method, path, body-or-None), ...] log."""
    state = {
        "databases": set(),
        "graphs": {},  # (db, graph) -> {"vertex": [...], "edge": [...]}
        "analyzers": set(),  # (db, name)
        "views": set(),  # (db, name)
    }
    requests: list[tuple[str, str, dict | None]] = []
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, status: int, payload: dict | None = None) -> None:
            body = json.dumps(payload or {}).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _record(self) -> dict | None:
            n = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(n)) if n else None
            with lock:
                requests.append((self.command, self.path, body))
            return body

        def do_GET(self):
            self._record()
            parts = self.path.strip("/").split("/")
            if self.path.endswith("/_api/database/current"):
                db = parts[1]
                return self._reply(200 if db in state["databases"] else 404)
            if "/_api/gharial/" in self.path:
                db = parts[1]
                g = (db, parts[4])
                if g not in state["graphs"]:
                    return self._reply(404)
                if len(parts) == 6:  # /vertex or /edge listing
                    return self._reply(
                        200, {"collections": state["graphs"][g][parts[5]]}
                    )
                return self._reply(200)
            if "/_api/analyzer/" in self.path:
                return self._reply(
                    200 if (parts[1], parts[-1]) in state["analyzers"] else 404
                )
            if "/_api/view/" in self.path:
                return self._reply(
                    200 if (parts[1], parts[-1]) in state["views"] else 404
                )
            return self._reply(404)

        def do_POST(self):
            body = self._record()
            parts = self.path.strip("/").split("/")
            if self.path == "/_api/database":
                state["databases"].add(body["name"])
                return self._reply(201)
            if self.path.endswith("/_api/gharial"):
                state["graphs"][(parts[1], body["name"])] = {"vertex": [], "edge": []}
                return self._reply(202)
            if "/_api/gharial/" in self.path and self.path.endswith(("/vertex", "/edge")):
                g = (parts[1], parts[4])
                state["graphs"][g][parts[5]].append(body["collection"])
                return self._reply(202)
            if self.path.endswith("/_api/analyzer"):
                state["analyzers"].add((parts[1], body["name"]))
                return self._reply(201)
            if self.path.endswith("/_api/view"):
                state["views"].add((parts[1], body["name"]))
                return self._reply(201)
            return self._reply(404)

        def do_DELETE(self):
            self._record()
            return self._reply(200)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield ArangoDdlClient(f"http://127.0.0.1:{server.server_address[1]}"), requests
    finally:
        server.shutdown()


def test_database_create_or_get_sequence(arango_sim):
    client, requests = arango_sim
    client.create_or_get_database("cell_kn")
    client.create_or_get_database("cell_kn")  # second call: probe only
    assert requests == [
        ("GET", "/_db/cell_kn/_api/database/current", None),
        ("POST", "/_api/database", {"name": "cell_kn"}),
        ("GET", "/_db/cell_kn/_api/database/current", None),
    ]


def test_graph_and_collection_sequences(arango_sim):
    client, requests = arango_sim
    client.create_or_get_database("db1")
    requests.clear()
    client.create_or_get_graph("db1", "KN")
    client.create_or_get_vertex_collection("db1", "KN", "CL")
    client.create_or_get_vertex_collection("db1", "KN", "CL")  # idempotent
    name = client.create_or_get_edge_collection("db1", "KN", "CL", "GO")
    assert name == "CL-GO"
    assert requests == [
        ("GET", "/_db/db1/_api/gharial/KN", None),
        # graph created with EMPTY edge definitions (ArangoDbUtilities.java:119-121)
        ("POST", "/_db/db1/_api/gharial", {"edgeDefinitions": [], "name": "KN"}),
        ("GET", "/_db/db1/_api/gharial/KN/vertex", None),
        ("POST", "/_db/db1/_api/gharial/KN/vertex", {"collection": "CL"}),
        ("GET", "/_db/db1/_api/gharial/KN/vertex", None),  # no second POST
        ("GET", "/_db/db1/_api/gharial/KN/edge", None),
        (
            "POST",
            "/_db/db1/_api/gharial/KN/edge",
            {"collection": "CL-GO", "from": ["CL"], "to": ["GO"]},
        ),
    ]


def test_analyzer_payloads_match_reference_config(arango_sim):
    """The two analyzer bodies are the exact ArangoDbUtilities.java:219-249
    configurations: n-gram 3-4 utf8 preserveOriginal; text en/lower/no
    accent/no stemming with 3-12 edge n-grams; both with
    frequency+norm+position features."""
    client, requests = arango_sim
    client.create_or_get_database("db1")
    requests.clear()
    client.create_analyzers("db1")
    client.create_analyzers("db1")  # idempotent: probes only
    posts = [(p, b) for (m, p, b) in requests if m == "POST"]
    assert posts == [
        ("/_db/db1/_api/analyzer", NGRAM_ANALYZER),
        ("/_db/db1/_api/analyzer", TEXT_NO_STEM_ANALYZER),
    ]
    assert NGRAM_ANALYZER["properties"] == {
        "min": 3, "max": 4, "preserveOriginal": True, "streamType": "utf8",
    }
    assert TEXT_NO_STEM_ANALYZER["properties"]["edgeNgram"] == {
        "min": 3, "max": 12, "preserveOriginal": True,
    }
    # second invocation added GETs only
    assert [m for (m, _, _) in requests[-2:]] == ["GET", "GET"]


def test_view_payload_links_and_intervals(arango_sim):
    """ArangoDbUtilities.java:282-312: view 'indexed', arangosearch, the
    1000/1000/2 intervals, link-level identity analyzer, per-field
    four-analyzer links, includeAllFields/storeValues/trackListPositions."""
    client, requests = arango_sim
    client.create_or_get_database("db1")
    requests.clear()
    client.create_view("db1", {"CL": ["label", "definition"], "GO": ["label"]})
    [(method, path, body)] = [r for r in requests if r[0] == "POST"]
    assert path == "/_db/db1/_api/view"
    assert body["name"] == "indexed" and body["type"] == "arangosearch"
    assert (
        body["cleanupIntervalStep"],
        body["commitIntervalMsec"],
        body["consolidationIntervalMsec"],
    ) == (2, 1000, 1000)
    cl = body["links"]["CL"]
    assert cl["analyzers"] == ["identity"]
    assert cl["includeAllFields"] is False
    assert cl["storeValues"] == "none"
    assert cl["trackListPositions"] is False
    assert cl["fields"]["label"]["analyzers"] == [
        "text_en", "text_en_no_stem", "n-gram", "identity",
    ]
    assert set(body["links"]) == {"CL", "GO"}


def test_delete_analyzers_tolerates_absence(arango_sim):
    """ArangoDbUtilities.java:257-271 deletes analyzers and swallows
    not-found — the client must issue both DELETEs and not raise."""
    client, requests = arango_sim
    client.delete_analyzers("db1")
    assert [(m, p) for (m, p, _) in requests] == [
        ("DELETE", "/_db/db1/_api/analyzer/n-gram"),
        ("DELETE", "/_db/db1/_api/analyzer/text_en_no_stem"),
    ]


def test_path_segments_percent_encoded(arango_sim):
    """ADVICE r5: names containing '/', '?', '#', or spaces must be
    percent-encoded into URL path segments (the Java driver encodes
    segments); unencoded they address a different resource or truncate at
    the query separator.  Bodies keep the raw name."""
    client, requests = arango_sim
    client.create_or_get_database("a/b c?d")
    assert requests == [
        ("GET", "/_db/a%2Fb%20c%3Fd/_api/database/current", None),
        ("POST", "/_api/database", {"name": "a/b c?d"}),
    ]
    requests.clear()
    client.create_or_get_graph("a/b c?d", "g#1")
    assert requests[0] == ("GET", "/_db/a%2Fb%20c%3Fd/_api/gharial/g%231", None)
    assert requests[1] == (
        "POST",
        "/_db/a%2Fb%20c%3Fd/_api/gharial",
        {"edgeDefinitions": [], "name": "g#1"},
    )


def test_full_search_ddl_posts_all_four_analyzer_payloads_then_view(arango_sim):
    """VERDICT r7 #8 — the COMPLETE four-analyzer search DDL on the wire:
    the two reference-created analyzers (ArangoDbUtilities.java:219-249),
    the two server built-ins the view links name (text_en — the :301
    stemmer config matching search/stemmer.py's gated chain — and
    identity, posted only because the emulated server lacks them), then
    the view body whose every field link references exactly those four.
    Order pinned: analyzers before the view, so no link ever names an
    analyzer the server hasn't seen."""
    from cell_kn_mvp_etl_ontologies_spark.sinks.http_transport import (
        IDENTITY_BUILTIN_ANALYZER,
        SEARCH_VIEW_ANALYZERS,
        TEXT_EN_BUILTIN_ANALYZER,
    )

    client, requests = arango_sim
    client.create_or_get_database("db1")
    requests.clear()
    client.create_search_ddl("db1", {"CL": ["label", "definition"], "GO": ["label"]})
    posts = [(p, b) for (m, p, b) in requests if m == "POST"]
    assert [p for p, _ in posts[:4]] == ["/_db/db1/_api/analyzer"] * 4
    assert [b["name"] for _, b in posts[:4]] == [
        "n-gram", "text_en_no_stem", "text_en", "identity",
    ]
    # the text_en body IS the stemmer contract: en/lower/no-accent/STEM ON
    assert TEXT_EN_BUILTIN_ANALYZER["properties"] == {
        "locale": "en", "case": "lower", "accent": False,
        "stemming": True, "stopwords": [],
    }
    assert IDENTITY_BUILTIN_ANALYZER["type"] == "identity"
    # view posts LAST, and its field links name exactly the four analyzers
    view_path, view_body = posts[4]
    assert view_path == "/_db/db1/_api/view" and len(posts) == 5
    for coll in ("CL", "GO"):
        for f, link in view_body["links"][coll]["fields"].items():
            assert link["analyzers"] == SEARCH_VIEW_ANALYZERS
    # posted analyzer set == set named by the links (plus link-level identity)
    posted = {b["name"] for _, b in posts[:4]}
    assert posted == set(SEARCH_VIEW_ANALYZERS)
    # second run: pure probes, nothing re-posted
    requests.clear()
    client.create_search_ddl("db1", {"CL": ["label", "definition"], "GO": ["label"]})
    assert all(m == "GET" for (m, _, _) in requests)
