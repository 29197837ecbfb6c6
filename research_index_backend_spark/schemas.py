"""Explicit StructType schemas: the engine's typed data model.

The reference validates graph entities with pydantic models
(reference src/research_index_backend/models.py) and navigates the OpenAire
JSON with hand-written .get() chains (reference parser.py:111-169). Here
both become explicit Spark schemas: `spark.read.json(schema=...)` makes the
list-vs-scalar normalization moot and gives Catalyst a fixed shape to prune
against — at 100 TB of landed JSONL, schema-on-read with an explicit schema
means the scan only materializes the fields the query touches.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# OpenAire Graph API v2 envelope (the subset the reference parses,
# reference parser.py:96-192; fixture tests/fixtures/openaire_v2_simple.json)
# ---------------------------------------------------------------------------

PID_SCHEMA = StructType([
    StructField("id", StructType([
        StructField("scheme", StringType()),
        StructField("value", StringType()),
    ])),
    StructField("provenance", StringType()),
])

AUTHOR_SCHEMA = StructType([
    StructField("fullName", StringType()),
    StructField("name", StringType()),
    StructField("surname", StringType()),
    StructField("rank", StringType()),      # arrives as "1" or 1 — read as string, cast later
    StructField("pid", PID_SCHEMA),
    StructField("orcid", StringType()),     # legacy top-level orcid (parser.py:18)
    StructField("$", StringType()),         # legacy v1 plain-string author (parser.py:33)
])

RESOURCETYPE_SCHEMA = StructType([
    StructField("@classid", StringType()),
    StructField("@classname", StringType()),
    StructField("@schemeid", StringType()),
    StructField("@schemename", StringType()),
])

RESULT_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("mainTitle", StringType()),
    StructField("descriptions", ArrayType(StringType())),
    StructField("authors", ArrayType(AUTHOR_SCHEMA)),
    StructField("publisher", StringType()),
    StructField("publicationDate", StringType()),
    StructField("journal", StructType([
        StructField("$", StringType()),
        StructField("issnPrinted", StringType()),
        StructField("issnOnline", StringType()),
    ])),
    StructField("type", StringType()),
    StructField("resourcetype", RESOURCETYPE_SCHEMA),
    StructField("pids", ArrayType(PID_SCHEMA)),
])

OPENAIRE_SCHEMA = StructType([
    StructField("header", StructType([
        StructField("numFound", LongType()),
        StructField("page", LongType()),
        StructField("pageSize", LongType()),
        StructField("queryTime", LongType()),
    ])),
    StructField("results", ArrayType(RESULT_SCHEMA)),
    # side-channel: which DOI this response was fetched for (added at landing)
    StructField("query_doi", StringType()),
])

# ---------------------------------------------------------------------------
# Legacy OpenAire "v1" envelope (XML-to-JSON oaf shape:
# response.results.result[].metadata.oaf:entity.oaf:result, attributes as
# @keys, text as $ — reference tests/fixtures/zenodo.json). The subset
# mirrors what the v2 parse extracts so both land in the same article shape.
# ---------------------------------------------------------------------------

_CLASSIFIED = StructType([               # @classid/@classname/@schemeid attrs
    StructField("@classid", StringType()),
    StructField("@classname", StringType()),
    StructField("@schemeid", StringType()),
    StructField("@schemename", StringType()),
    StructField("$", StringType()),
])

ZENODO_V1_CREATOR = StructType([
    StructField("@rank", StringType()),
    StructField("@name", StringType()),
    StructField("@surname", StringType()),
    StructField("@orcid", StringType()),
    StructField("@orcid_pending", StringType()),
    StructField("$", StringType()),      # "Surname, Name" fallback
])

ZENODO_V1_RESULT = StructType([
    StructField("header", StructType([
        StructField("dri:objIdentifier", StructType([
            StructField("$", StringType()),
        ])),
    ])),
    StructField("metadata", StructType([
        StructField("oaf:entity", StructType([
            StructField("oaf:result", StructType([
                StructField("pid", ArrayType(_CLASSIFIED)),
                StructField("title", _CLASSIFIED),
                StructField("creator", ArrayType(ZENODO_V1_CREATOR)),
                StructField("dateofacceptance", StructType([
                    StructField("$", StringType()),
                ])),
                StructField("description", StructType([
                    StructField("$", StringType()),
                ])),
                StructField("publisher", StructType([
                    StructField("$", StringType()),
                ])),
                StructField("journal", StructType([
                    StructField("$", StringType()),
                ])),
                StructField("resulttype", _CLASSIFIED),
                StructField("resourcetype", _CLASSIFIED),
            ])),
        ])),
    ])),
])

ZENODO_V1_SCHEMA = StructType([
    StructField("response", StructType([
        StructField("results", StructType([
            StructField("result", ArrayType(ZENODO_V1_RESULT)),
        ])),
    ])),
    # side-channel: which DOI this response was fetched for (added at landing)
    StructField("query_doi", StringType()),
])

# ---------------------------------------------------------------------------
# OpenAlex works body (the subset the reference reads: `id` and
# `cited_by_count`, reference parser.py:183-186 fed by get_metadata.py:69-87;
# counts_by_year parsed here as an engine extension — the reference always
# stores None for it, models.py/parser.py:188)
# ---------------------------------------------------------------------------

OPENALEX_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("doi", StringType()),
    StructField("cited_by_count", LongType()),
    StructField("counts_by_year", ArrayType(StructType([
        StructField("year", IntegerType()),
        StructField("cited_by_count", IntegerType()),
    ]))),
])

# ---------------------------------------------------------------------------
# Property-graph node / edge tables (reference models.py:28-375)
# ---------------------------------------------------------------------------

AUTHOR_NODE = StructType([
    StructField("uuid", StringType(), False),
    StructField("first_name", StringType()),
    StructField("last_name", StringType()),
    StructField("orcid", StringType()),
    StructField("openalex", StringType()),
    StructField("rank", IntegerType()),
])

OUTPUT_NODE = StructType([
    StructField("uuid", StringType(), False),
    StructField("doi", StringType()),
    StructField("title", StringType()),
    StructField("abstract", StringType()),
    StructField("journal", StringType()),
    StructField("issue", IntegerType()),
    StructField("volume", IntegerType()),
    StructField("publication_year", IntegerType()),
    StructField("publication_month", IntegerType()),
    StructField("publication_day", IntegerType()),
    StructField("publisher", StringType()),
    StructField("result_type", StringType()),
    StructField("resource_type", StringType()),
    StructField("openalex", StringType()),
    StructField("cited_by_count", IntegerType()),
    StructField("cited_by_count_date", IntegerType()),
    StructField("counts_by_year", MapType(IntegerType(), IntegerType())),
])

COUNTRY_NODE = StructType([
    StructField("id", StringType(), False),      # cca3
    StructField("name", StringType()),
    StructField("official_name", StringType()),
    StructField("dbpedia", StringType()),
    StructField("latitude", DoubleType()),
    StructField("longitude", DoubleType()),
])

# Multi-label :Workstream:Unit / :Partner:Unit (reference models.py:305-342)
# becomes one units table with a unit_type discriminator — a :Unit query is
# no filter, :Partner is unit_type='partner'.
UNIT_NODE = StructType([
    StructField("id", StringType(), False),
    StructField("name", StringType()),
    StructField("unit_type", StringType(), False),   # workstream | partner
    StructField("dbpedia", StringType()),
    StructField("ror", StringType()),
    StructField("openalex", StringType()),
])

AUTHOR_OF_EDGE = StructType([        # (Author)-[author_of {rank}]->(Output)
    StructField("author_uuid", StringType(), False),
    StructField("output_uuid", StringType(), False),
    StructField("rank", IntegerType()),
])

MEMBER_OF_EDGE = StructType([        # (Author)-[member_of]->(Unit)
    StructField("author_uuid", StringType(), False),
    StructField("unit_id", StringType(), False),
])

UNIT_OF_EDGE = StructType([          # (Unit child)-[unit_of]->(Unit parent)
    StructField("child_id", StringType(), False),
    StructField("parent_id", StringType(), False),
])

REFERS_TO_EDGE = StructType([        # (Output)-[refers_to]->(Country)
    StructField("output_uuid", StringType(), False),
    StructField("country_id", StringType(), False),
])

# ---------------------------------------------------------------------------
# Consortium init CSVs (reference create_graph.py:292-310; data/init/*.csv)
# ---------------------------------------------------------------------------

# Explicit schemas double as the BOM workaround: with a schema +
# header=true Spark skips the header line entirely, so the U+FEFF that
# prefixes several init files never reaches a column name.

WORKSTREAM_CSV = StructType([        # id,name,description,theme
    StructField("id", StringType()),
    StructField("name", StringType()),
    StructField("description", StringType()),
    StructField("theme", StringType()),
])

SUBWS_CSV = StructType([             # parent,child
    StructField("parent", StringType()),
    StructField("child", StringType()),
])

PARTNER_CSV = StructType([           # id,name,dbpedia,ror,openalex
    StructField("id", StringType()),
    StructField("name", StringType()),
    StructField("dbpedia", StringType()),
    StructField("ror", StringType()),
    StructField("openalex", StringType()),
])

AUTHOR_CSV = StructType([  # uuid,first_name,last_name,Orcid,google_scholar,pubmed,institution_url,gender
    StructField("uuid", StringType()),
    StructField("first_name", StringType()),
    StructField("last_name", StringType()),
    StructField("Orcid", StringType()),
    StructField("google_scholar", StringType()),
    StructField("pubmed", StringType()),
    StructField("institution_url", StringType()),
    StructField("gender", StringType()),
])

WP_MEMBER_CSV = StructType([         # id,name,role,orcid,start,end
    StructField("id", StringType()),
    StructField("name", StringType()),
    StructField("role", StringType()),
    StructField("orcid", StringType()),
    StructField("start", StringType()),
    StructField("end", StringType()),
])

PARTNER_MEMBER_CSV = StructType([    # id,name,orcid
    StructField("id", StringType()),
    StructField("name", StringType()),
    StructField("orcid", StringType()),
])

# countries.csv has ~68 columns (mledoze/countries export); the engine reads
# it header=true (quoted, no BOM) and projects just the columns the
# reference uses (create_graph.py:106-123) — column pruning at the scan.
COUNTRY_CSV_USED = ("name.common", "name.official", "cca3", "latlng")
