"""Sink round-trips and the versioned downloader state machine."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.fixtures import fixture_ro_terms, fixture_triples
from cell_kn_mvp_etl_ontologies_spark.plans import build_graph
from cell_kn_mvp_etl_ontologies_spark.sinks import (
    export_jsonl,
    read_graph_vertices,
    upsert_parquet,
    write_deprecated_terms,
    write_edge_labels,
    write_graph,
)
from cell_kn_mvp_etl_ontologies_spark.sources.files import (
    list_files_matching_pattern,
    scan_dir_regex,
)
from cell_kn_mvp_etl_ontologies_spark.sources.http_versioned import update_downloads
from cell_kn_mvp_etl_ontologies_spark.sources.owl_fixtures import (
    NO_VERSION_TEST_OWL,
    VERSION_INFO_TEST_OWL,
    write_fixture_dir,
)


@pytest.fixture(scope="module")
def graph(spark):
    return build_graph(fixture_triples(spark), fixture_ro_terms(spark))


def test_graph_sink_roundtrip(spark, graph, tmp_path):
    root = str(tmp_path / "store")
    write_graph(graph.vertices, graph.edges, root, "Cell-KN-Ontologies", "KN-Ontologies-v2.0")
    back = read_graph_vertices(spark, root, "Cell-KN-Ontologies", "KN-Ontologies-v2.0")
    assert back.count() == graph.vertices.count()
    # partition pruning: reading one collection touches only its directory
    assert back.filter(F.col("collection") == "GO").count() == 1
    assert os.path.isdir(f"{root}/Cell-KN-Ontologies/KN-Ontologies-v2.0/vertices/collection=CL")


def test_upsert_parquet(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k: long, v: string")
    upsert_parquet(spark, base, path, ["k"])
    update = spark.createDataFrame([(2, "B"), (3, "c")], "k: long, v: string")
    upsert_parquet(spark, update, path, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_side_outputs_and_jsonl(spark, graph, tmp_path):
    dep = str(tmp_path / "dep")
    write_deprecated_terms(graph.deprecated, dep)
    assert {r["value"] for r in spark.read.text(dep).collect()} == {"CL_0000999"}
    lab = str(tmp_path / "lab")
    write_edge_labels(graph.edge_labels, lab)
    rows = {
        (r["raw_label"], r["normalized_label"])
        for r in spark.read.option("header", "true").csv(lab).collect()
    }
    assert ("develops from", "DEVELOPS_FROM") in rows
    j = str(tmp_path / "jsonl")
    export_jsonl(graph.deprecated, j, coalesce=1)
    assert spark.read.json(j).count() == 1


def test_scan_dir_regex(spark, tmp_path_factory):
    d = write_fixture_dir(str(tmp_path_factory.mktemp("obo_scan")))
    # PathUtilitiesTest.java:19-59: all five fixtures match .*\.owl
    assert len(list_files_matching_pattern(d, r".*\.owl")) == 5
    assert len(list_files_matching_pattern(d, r"ro\.owl")) == 1
    assert list_files_matching_pattern(d, r".*\.nope") == []
    with pytest.raises(FileNotFoundError):
        list_files_matching_pattern(d + "/missing", r".*")
    df = scan_dir_regex(spark, d, r".*\.owl", glob="*.owl")
    assert df.count() == 5
    assert scan_dir_regex(spark, d, r"ro\.owl").count() == 1


def _fake_fetch_factory(payload: bytes):
    def fetch(url: str) -> bytes:
        return payload

    return fetch


def test_downloader_state_machine(tmp_path):
    d = str(tmp_path / "obo")
    url = ["http://example.org/obo/cl.owl"]
    old = VERSION_INFO_TEST_OWL.replace("2024-01-15", "2023-05-01").encode()
    new = VERSION_INFO_TEST_OWL.encode()  # 2024-01-15

    # first download: init
    out = update_downloads(url, d, fetch=_fake_fetch_factory(old))[0]
    assert out.decision == "init" and out.version_new == "2023-05-01"
    # newer version: replace + archive
    out = update_downloads(url, d, fetch=_fake_fetch_factory(new))[0]
    assert out.decision == "replace"
    assert out.version_cur == "2023-05-01" and out.version_new == "2024-01-15"
    assert os.path.exists(f"{d}/.archive/cl-2023-05-01.owl")
    # same version again: keep, download removed
    out = update_downloads(url, d, fetch=_fake_fetch_factory(new))[0]
    assert out.decision == "keep"
    assert not os.path.exists(f"{d}/cl-new.owl")
    # unversioned download against versioned current: keep
    out = update_downloads(url, d, fetch=_fake_fetch_factory(NO_VERSION_TEST_OWL.encode()))[0]
    assert out.decision == "keep" and out.version_new is None


def test_downloader_requires_explicit_fetch(tmp_path):
    with pytest.raises(ValueError):
        update_downloads(["http://example.org/x.owl"], str(tmp_path))
