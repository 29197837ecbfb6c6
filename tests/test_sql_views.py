"""SQL surface: temp-view registration + the Cypher-twin example queries."""

from __future__ import annotations

from research_index_backend_spark.plans.sql_views import (
    cypher_examples,
    register_graph_views,
)


def _write(spark, path, rows, cols):
    spark.createDataFrame(rows, cols).write.parquet(str(path))


def test_register_and_query(spark, tmp_path):
    _write(spark, tmp_path / "authors",
           [("u1", "Lucy", "Allington", "https://orcid.org/0000-1", None, 1)],
           "uuid string, first_name string, last_name string, "
           "orcid string, openalex string, rank int")
    _write(spark, tmp_path / "outputs",
           [("o1", "10.1/x", "T"), ("o2", "10.1/y", "U")],
           ["uuid", "doi", "title"])
    _write(spark, tmp_path / "author_of", [("u1", "o1", 1)],
           ["author_uuid", "output_uuid", "rank"])
    _write(spark, tmp_path / "refers_to", [("o1", "LBR"), ("o2", "LBR"),
                                           ("o1", "KEN")],
           ["output_uuid", "country_id"])
    _write(spark, tmp_path / "countries",
           [("LBR", "Liberia"), ("KEN", "Kenya")], ["id", "name"])

    views = register_graph_views(spark, str(tmp_path))
    assert set(views) == {"authors", "outputs", "author_of",
                          "refers_to", "countries"}

    q = cypher_examples()
    got = spark.sql(q["author_by_orcid"],
                    args={"orcid": "https://orcid.org/0000-1"}).collect()
    assert [r["first_name"] for r in got] == ["Lucy"]

    assert spark.sql(q["output_exists"],
                     args={"doi": "10.1/x"}).collect()[0]["exists_flag"]
    assert not spark.sql(q["output_exists"],
                         args={"doi": "10.9/nope"}).collect()[0]["exists_flag"]

    authors = spark.sql(q["authors_of_output"],
                        args={"doi": "10.1/x"}).collect()
    assert [r["last_name"] for r in authors] == ["Allington"]

    per_country = spark.sql(q["outputs_per_country"]).collect()
    assert [(r["name"], r["n_outputs"]) for r in per_country] == [
        ("Liberia", 2), ("Kenya", 1)]
