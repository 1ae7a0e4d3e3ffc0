"""LTA catalog query & retrieval plan (SURVEY §3.1, D5, J1/J2,
P5/P6, A10/A11).

Re-expresses the reference's Oracle superquery
(/root/reference/LTA/lta-query.py:32-76 project-scoped, :104-148
public variant) over Spark SQL tables. The reference pushes all work
to a remote Oracle server; here the same relational semantics run on
the lakehouse copy of the catalog, with Catalyst doing join ordering
and pushdown.

Schema (F5 of FIXTURES.md): the four per-type data-product tables are
one ``data_product`` table with ``dp_type`` in {beamformed, pulp,
pulp_summary, unspecified} — the UNION branches filter on it, which is
exactly what the reference's four SELECTs do structurally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CATALOG_SCHEMAS = {
    "file_object": T.StructType(
        [
            T.StructField("object_id", T.LongType(), False),
            T.StructField("data_object", T.LongType(), False),
            T.StructField("filename", T.StringType(), False),
            T.StructField("filesize", T.LongType(), False),
            T.StructField("creation_date", T.TimestampType(), True),
            T.StructField("uri", T.StringType(), True),
            T.StructField("is_valid", T.IntegerType(), False),
        ]
    ),
    "data_product": T.StructType(
        [
            T.StructField("object_id", T.LongType(), False),
            T.StructField("dp_type", T.StringType(), False),
            T.StructField("project_id", T.LongType(), False),
            T.StructField("is_valid", T.IntegerType(), False),
            T.StructField("unspecified_process", T.LongType(), True),
        ]
    ),
    "dp_observations": T.StructType(
        [
            T.StructField("object_id", T.LongType(), False),
            T.StructField("column_value", T.LongType(), False),
        ]
    ),
    "observation": T.StructType(
        [
            T.StructField("object_id", T.LongType(), False),
            T.StructField("observation_id", T.LongType(), False),
        ]
    ),
    "awe_projects": T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), False),
        ]
    ),
}

DP_TYPES = ("beamformed", "pulp", "pulp_summary", "unspecified")


def register_catalog(spark: SparkSession, tables: dict[str, DataFrame]) -> None:
    for name in CATALOG_SCHEMAS:
        tables[name].createOrReplaceTempView(f"lta_{name}")


def register_catalog_jdbc(
    spark: SparkSession,
    url: str,
    driver: str | None = None,
    table_prefix: str = "lta_",
    **options: str,
) -> None:
    """S8 LIVE catalog source: the reference connects straight to the
    LTA Oracle database (lta-query.py:182 ``cx_Oracle.connect``); the
    parquet mirror in ``register_catalog`` is the offline dual. This
    registers the same ``lta_*`` temp views from ``spark.read.jdbc``,
    so every downstream plan (superquery, manifests, regex filters)
    runs unchanged against the live DB.

    Scale notes: Catalyst pushes the validity/project predicates and
    column pruning into the remote WHERE/SELECT (JDBC PushedFilters),
    so the catalog DB — a dimension source — ships only matching rows;
    pass ``numPartitions``/``partitionColumn``/``lowerBound``/
    ``upperBound`` through ``options`` to parallelize a large table
    scan. Any JDBC driver on the executor classpath works (the
    integration test uses Spark's bundled embedded Derby standing in
    for Oracle)."""
    for name in CATALOG_SCHEMAS:
        reader = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", f"{table_prefix}{name}")
        )
        if driver:
            reader = reader.option("driver", driver)
        for k, v in options.items():
            reader = reader.option(k, v)
        reader.load().createOrReplaceTempView(f"lta_{name}")


def superquery(
    spark: SparkSession, project_id: int | None = None, form: str = "single"
) -> DataFrame:
    """The superquery (lta-query.py:32-76): file_object ->
    data_product -> bridge -> observation with validity predicates
    (P3) and optional project scope (P4/J2), covering all four
    data-product types.

    ``form='single'`` (default, Spark-first): because the four
    per-type branches differ ONLY in the dp_type constant and our
    lakehouse schema already carries dp_type as a column, the 4-branch
    UNION is exactly one join keeping dp_type — the branches are
    disjoint, so UNION-dedup adds nothing. One fact scan instead of
    four (the same measured rewrite as catalog_union).

    ``form='union'`` keeps the literal 4-branch UNION of the reference
    for parity checking; both forms are asserted equal in tests."""
    proj = (
        f"AND dp.project_id = {int(project_id)}" if project_id is not None else ""
    )
    if form == "single":
        types = ", ".join(f"'{t}'" for t in DP_TYPES)
        return spark.sql(
            f"""
            SELECT fo.filename, fo.filesize, fo.creation_date, fo.uri,
                   obs.observation_id, dp.dp_type
            FROM lta_file_object fo
              JOIN lta_data_product dp
                ON fo.data_object = dp.object_id
               AND dp.dp_type IN ({types})
              JOIN lta_dp_observations dpo ON dpo.object_id = dp.object_id
              JOIN lta_observation obs ON dpo.column_value = obs.object_id
            WHERE fo.is_valid > 0 AND dp.is_valid > 0 {proj}
            """
        )
    branches = []
    for dp_type in DP_TYPES:
        branches.append(
            f"""
            SELECT fo.filename, fo.filesize, fo.creation_date, fo.uri,
                   obs.observation_id, '{dp_type}' AS dp_type
            FROM lta_file_object fo
              JOIN lta_data_product dp
                ON fo.data_object = dp.object_id
               AND dp.dp_type = '{dp_type}'
              JOIN lta_dp_observations dpo ON dpo.object_id = dp.object_id
              JOIN lta_observation obs ON dpo.column_value = obs.object_id
            WHERE fo.is_valid > 0 AND dp.is_valid > 0 {proj}
            """
        )
    return spark.sql("\nUNION\n".join(branches))


def superquery_for_project(spark: SparkSession, project_name: str) -> DataFrame:
    """Project scoping via scalar subquery on awe_projects (J2,
    lta-query.py:112), with the empty-result fallback to the public
    catalog (lta-query.py:183-186)."""
    scoped = spark.sql(
        "SELECT id FROM lta_awe_projects WHERE name = :name",
        args={"name": project_name},
    ).collect()
    if scoped:
        df = superquery(spark, project_id=scoped[0]["id"])
        if not df.isEmpty():
            return df
    return superquery(spark, project_id=None)


# --- retrieval filters (lta-retrieve.py:423-457) ---------------------

_SUMMARY_RE = r"(CSplots|redIS|summary)"


def filter_by_obsids(df: DataFrame, obsids: list[int]) -> DataFrame:
    """P6 regex semi-join: keep rows whose filename or observation_id
    matches any requested ObsID (lta-retrieve.py:382,389-390).
    Implemented as a broadcast semi-join on observation_id plus the
    filename pattern — no N-way OR scan."""
    if not obsids:
        # an empty request selects nothing (an empty rlike pattern
        # would match EVERY filename)
        return df.limit(0)
    ids = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(i),) for i in obsids], "observation_id long"
        )
    )
    by_id = df.join(ids, "observation_id", "left_semi")
    # trailing '_' so L10000 does not prefix-match L100001_SAP...
    pattern = "|".join(f"L{int(i)}_" for i in obsids)
    by_name = df.filter(F.col("filename").rlike(pattern))
    return by_id.unionByName(by_name).dropDuplicates(["filename"])


def filter_parts(
    df: DataFrame,
    sap: int | None = None,
    tab: int | None = None,
    part: int | None = None,
    summaries: bool | None = None,
) -> DataFrame:
    """P5 SAP/TAB/PART filename-grammar filters
    (lta-retrieve.py:444-455): patterns _SAP%03d_, _B%03d_, _P%03d_;
    summary files matched by CSplots/redIS markers
    (lta-retrieve.py:431-434)."""
    out = df
    if sap is not None:
        out = out.filter(F.col("filename").rlike(f"_SAP{sap:03d}_"))
    if tab is not None:
        out = out.filter(F.col("filename").rlike(f"_B{tab:03d}_"))
    if part is not None:
        out = out.filter(F.col("filename").rlike(f"_P{part:03d}_"))
    if summaries is True:
        out = out.filter(F.col("filename").rlike(_SUMMARY_RE))
    elif summaries is False:
        out = out.filter(~F.col("filename").rlike(_SUMMARY_RE))
    return out


def download_manifest(df: DataFrame) -> DataFrame:
    """A10 dedup + A11 totals (lta-retrieve.py:466-469): distinct
    filenames with per-host grouping and grand total GB."""
    deduped = df.dropDuplicates(["filename"])
    host = F.regexp_extract(F.col("uri"), r"srm://([^:/]+)", 1)
    return deduped.groupBy(host.alias("host")).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.round(F.sum(F.col("filesize")) / 1e9, 3).alias("total_gb"),
    )


def make_synthetic_catalog(
    spark: SparkSession,
    n_obs: int = 5,
    files_per_obs: int = 12,
    n_projects: int = 3,
) -> dict[str, DataFrame]:
    """Deterministic synthetic D5 catalog for tests (FIXTURES.md F5):
    filenames follow the SAP/TAB/PART grammar; every 6th file invalid;
    one summary file per obs."""
    projects = [(i, f"LC{i}_{i:03d}") for i in range(n_projects)]
    fo, dp, dpo, obs = [], [], [], []
    oid = 1000
    for o in range(n_obs):
        obs_object = 5000 + o
        obs_id = 100000 + o
        obs.append((obs_object, obs_id))
        for fidx in range(files_per_obs):
            dp_object = 2000 + o * 100 + fidx
            dp_type = DP_TYPES[fidx % 4]
            project = fidx % n_projects
            dp.append((dp_object, dp_type, project, 1 if fidx % 5 else 0, None))
            dpo.append((dp_object, obs_object))
            sap, tab, part = fidx % 2, fidx % 3, fidx % 4
            fname = (
                f"L{obs_id}_SAP{sap:03d}_B{tab:03d}_S0_P{part:03d}_bf.tar"
                if fidx < files_per_obs - 1
                else f"L{obs_id}_CSplots_summary.tar"
            )
            uri = f"srm://host{fidx % 3}.example.org:8443/{fname}"
            fo.append(
                (
                    oid,
                    dp_object,
                    fname,
                    (fidx + 1) * 123_456_789,
                    None,
                    uri,
                    1 if fidx % 6 else 0,
                )
            )
            oid += 1
    return {
        "file_object": spark.createDataFrame(fo, CATALOG_SCHEMAS["file_object"]),
        "data_product": spark.createDataFrame(dp, CATALOG_SCHEMAS["data_product"]),
        "dp_observations": spark.createDataFrame(
            dpo, CATALOG_SCHEMAS["dp_observations"]
        ),
        "observation": spark.createDataFrame(obs, CATALOG_SCHEMAS["observation"]),
        "awe_projects": spark.createDataFrame(
            projects, CATALOG_SCHEMAS["awe_projects"]
        ),
    }
