"""The flagship CODEX concatenation pipeline — reference Entry C
(pipeline.cwl → bin/concatenate.py main(), SURVEY.md §3.3) as one lazy
Spark DAG.

Differences from the reference, by design (SURVEY §3.3 "Spark
re-expression"):

  * the per-dataset Python loop builds *plans*, not data — per-dataset
    frames are unioned lazily and execute as one job;
  * file quintuples are aligned by dataset uuid parsed from paths, not by
    zip order (J7 — the reference silently mis-pairs incomplete lists);
  * the expression matrix lives in long form (cell_id, channel, total,
    mean) — the scale representation; wide export is a pivot at the sink;
  * adjacency is an edge list on globally-unique string cell ids, so the
    block-diagonal union (U3) is a plain unionByName;
  * uuid/timestamp are injectable for reproducible products (E8/E9).

Product layout (K1): a directory of parquet tables (x_long partitioned
by dataset for partition pruning) + uns.json + a manifest (K2).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.functions.antibodies import canonical_channel_py
from codex_data_products_spark.sources.antibodies_tsv import (
    first_match_per_antibody,
    read_antibodies,
)
from codex_data_products_spark.sources.expression_csv import (
    read_centers,
    read_channel_names,
)
from codex_data_products_spark.sources.hdf5 import Decoder, h5py_decoder, read_hdf5_expression
from codex_data_products_spark.sources.labels import read_labels, remap_edges_to_cell_ids
from codex_data_products_spark.sources.matrix_market import read_matrix_market

# S10: the five glob families, two filename variants each
# (find_files_by_type, bin/concatenate.py:118-151).
FILE_PATTERNS = {
    "hdf5": ["out.hdf5"],
    "expression_csv": [
        "reg1_stitched_expressions.ome.tiff-cell_channel_total.csv",
        "reg001_expr.ome.tiff-cell_channel_total.csv",
    ],
    "adjacency": [
        "reg1_stitched_expressions.ome.tiff_AdjacencyMatrix.mtx",
        "reg001_expr.ome.tiff_AdjacencyMatrix.mtx",
    ],
    "labels": [
        "reg1_stitched_expressions.ome.tiff_AdjacencyMatrixRowColLabels.txt",
        "reg001_expr.ome.tiff_AdjacencyMatrixRowColLabels.txt",
    ],
    "centers": [
        "reg1_stitched_expressions.ome.tiff-cell_centers.csv",
        "reg001_expr.ome.tiff-cell_centers.csv",
    ],
}

CHANNEL_DROP_REGEX = r"^Channel:\d+:\d+$"  # F5, bin/concatenate.py:443-447


@dataclass
class CodexProduct:
    """The data product as logical tables (SURVEY §1.1 data model)."""

    x_long: DataFrame  # (dataset, cell_id, channel, total, mean)
    obs: DataFrame  # cell metadata + donor fields + Epic literals
    var: DataFrame  # surviving channels
    varm_long: DataFrame  # (channel, dataset, uniprot, rrid, antibodies_tsv_id)
    edges: DataFrame  # (dataset, src_cell_id, dst_cell_id, weight)
    uns: dict = field(default_factory=dict)
    # varm rows BEFORE the survivorship semi-join against the global var
    # axis — the per-dataset-pure relation the incremental maintainer
    # (streaming/product_ivm.py) persists so varm survivorship can be
    # re-derived against the MAINTAINED var axis, not a block-local one.
    varm_raw: DataFrame | None = None


def discover_dataset_files(data_dir: str, dataset_uuid: str) -> dict[str, str] | None:
    """S10: glob the five file families under one dataset dir; first
    match per family (find_files early-return, make_directory.py:12-19).
    Driver-side file-metadata work, like Spark's own file listing."""
    base = os.path.join(data_dir, dataset_uuid)
    if not os.path.isdir(base):
        return None
    found: dict[str, str] = {}
    for kind, patterns in FILE_PATTERNS.items():
        for pat in patterns:
            hits = sorted(glob.glob(os.path.join(base, "**", pat), recursive=True))
            if hits:
                found[kind] = hits[0]
                break
    required = {"expression_csv", "adjacency", "labels", "centers"}
    return found if required <= set(found) else None


def read_catalog(spark: SparkSession, uuids_tsv: str) -> DataFrame:
    """S1: the uuids TSV with the pandas index column dropped
    (F1, bin/concatenate.py:303,306 — '^Unnamed' prune)."""
    df = spark.read.options(sep="\t", header=True).csv(uuids_tsv)
    keep = [
        c
        for c in df.columns
        if c and not c.startswith("Unnamed") and not c.startswith("_c")
    ]
    return df.select(*keep)


def build_product(
    spark: SparkSession,
    data_dir: str,
    uuids_tsv: str,
    tissue: str | None = None,
    *,
    decoder: Decoder = h5py_decoder,
    tissue_by_uuid: dict[str, str] | None = None,
    product_uuid: str | None = None,
    creation_time: str | None = None,
    only_datasets: list[str] | None = None,
) -> CodexProduct:
    """Compose the full Entry-C DAG. Nothing executes here except tiny
    driver-side metadata reads (catalog collect, CSV headers).

    ``only_datasets`` restricts the build to a subset of the catalog's
    leaf datasets — the incremental maintainer's block builder: because
    every per-dataset table is a per-dataset-pure function of that
    dataset's files (the F5 channel predicate is row-local, the donor
    join keys on the dataset's own catalog row), a subset build produces
    EXACTLY the rows the full build produces for those datasets. Only
    ``var`` (the cross-dataset channel axis) and ``varm_long`` (semi-
    joined against it) are block-relative; the maintainer re-derives
    both from its persisted per-dataset state."""
    import uuid as uuidlib
    from datetime import datetime

    catalog = read_catalog(spark, uuids_tsv)
    cat_rows = catalog.select(
        "uuid", "hubmap_id", "immediate_ancestor_ids", "immediate_descendant_ids"
    ).collect()  # catalog ≤ thousands of rows: driver-side like J2

    # F2: leaves = processed datasets (null descendants,
    # bin/concatenate.py:339-342).
    leaves = [r for r in cat_rows if r["immediate_descendant_ids"] is None]
    if only_datasets is not None:
        known = {r["uuid"] for r in leaves}
        missing = [u for u in only_datasets if u not in known]
        if missing:
            raise ValueError(f"not leaf datasets in the catalog: {missing}")
        wanted = set(only_datasets)
        leaves = [r for r in leaves if r["uuid"] in wanted]
    processed_uuids = [r["uuid"] for r in leaves]
    processed_hbmids = [r["hubmap_id"] for r in leaves]
    ancestor_of = {r["uuid"]: r["immediate_ancestor_ids"] for r in cat_rows}

    x_parts: list[DataFrame] = []
    obs_parts: list[DataFrame] = []
    varm_parts: list[DataFrame] = []
    edge_parts: list[DataFrame] = []

    for ds in processed_uuids:
        files = discover_dataset_files(data_dir, ds)
        if files is None:  # skip-sparse-dirs guard (bin/concatenate.py:358-359)
            continue
        ds_tissue = tissue or (tissue_by_uuid or {}).get(ds, "unknown")

        # Channel names: CSV header (S3), canonicalized BEFORE the union
        # (J4 on var names: find_antibody_key only, bin/concatenate.py:246).
        raw_channels = read_channel_names(files["expression_csv"])
        channels = [canonical_channel_py(c) for c in raw_channels]
        channel_map = spark.createDataFrame(
            [(i, c) for i, c in enumerate(channels)], "channel_idx int, channel string"
        )

        # S4: HDF5 decode (one task per file) → long rows; channel names
        # joined on position.
        expr = read_hdf5_expression(spark, files["hdf5"], decoder=decoder)
        global_id = F.concat_ws("-", F.col("dataset"), F.col("original_obs_id"))
        x_parts.append(
            expr.join(F.broadcast(channel_map), "channel_idx")
            .select(
                "dataset",
                global_id.alias("cell_id"),
                "channel",
                "total",
                "mean",
            )
        )

        # obs: one row per cell + centers coordinates (F4/J3 semi
        # semantics via left join on the cell's own id set).
        cells = expr.select("dataset", "original_obs_id").distinct()
        centers = read_centers(spark, files["centers"])
        obs_parts.append(
            cells.join(centers, "original_obs_id", "left")
            .select(
                F.concat_ws("-", "dataset", "original_obs_id").alias("cell_id"),
                "dataset",
                "original_obs_id",
                F.lit(ds_tissue).alias("tissue"),
                "x",
                "y",
            )
        )

        # varm: parent antibodies.tsv (J2 ancestor lookup) ∩ var channels
        # (U2), first match per name (A5), tidy long form (P1 internal).
        parent = ancestor_of.get(ds)
        antibodies_path = None
        if parent:
            hits = sorted(
                glob.glob(os.path.join(data_dir, parent, "*antibodies.tsv"))
            )
            antibodies_path = hits[0] if hits else None
        if antibodies_path:
            antb = first_match_per_antibody(
                read_antibodies(spark, antibodies_path)
            )
            ds_channels = spark.createDataFrame(
                [(c,) for c in channels], "channel string"
            )
            varm_parts.append(
                antb.join(
                    ds_channels, antb.antibody_name == ds_channels.channel, "inner"
                ).select(
                    "channel",
                    F.lit(ds).alias("dataset"),
                    F.col("uniprot_accession_number").alias("uniprot"),
                    F.col("rr_id").alias("rrid"),
                    F.col("channel_id").alias("antibodies_tsv_id"),
                )
            )

        # Adjacency: MM positions → cell ids, edges kept only when both
        # endpoints exist in obs (W1 + J3, bin/concatenate.py:310-330),
        # then globalized — U3 block-diagonal union for free.
        mm = read_matrix_market(spark, files["adjacency"])
        labels = read_labels(spark, files["labels"])
        keep = cells.select(F.col("original_obs_id").alias("cell_id"))
        local_edges = remap_edges_to_cell_ids(mm, labels, keep=keep)
        edge_parts.append(
            local_edges.select(
                F.lit(ds).alias("dataset"),
                F.concat_ws("-", F.lit(ds), "src_cell_id").alias("src_cell_id"),
                F.concat_ws("-", F.lit(ds), "dst_cell_id").alias("dst_cell_id"),
                "weight",
            )
        )

    if not x_parts:
        raise ValueError(f"no complete datasets found under {data_dir}")

    def union_all(parts: list[DataFrame]) -> DataFrame:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # U1: outer union-by-name across datasets (anndata.concat(join="outer"),
    # bin/concatenate.py:412). Long form: missing (cell, channel) pairs are
    # simply absent — documented null-vs-absent choice (SURVEY §7 hard #5).
    x_long = union_all(x_parts)
    obs = union_all(obs_parts)
    edges = union_all(edge_parts) if edge_parts else None
    varm_long = (
        union_all(varm_parts)
        if varm_parts
        else spark.createDataFrame(
            [],
            "channel string, dataset string, uniprot string, rrid string, "
            "antibodies_tsv_id string",
        )
    )

    # F5: unidentifiable-channel filter, pushed (by us, once) below every
    # consumer instead of running after full materialization.
    var = (
        x_long.select("channel")
        .distinct()
        .filter(
            ~F.col("channel").rlike(CHANNEL_DROP_REGEX)
            & ~F.lower(F.col("channel")).contains("blank")
        )
    )
    x_long = x_long.join(F.broadcast(var), "channel", "left_semi").select(
        "dataset", "cell_id", "channel", "total", "mean"
    )
    # J5: varm re-indexed to the surviving channel axis. The pre-join
    # relation is kept on the product (varm_raw) for the incremental
    # maintainer, which must re-derive survivorship against the
    # maintained global axis rather than this build's block-local one.
    varm_raw = varm_long
    varm_long = varm_long.join(F.broadcast(var), "channel", "left_semi")

    # J1: donor metadata broadcast join + E5 age cast + F7 Epic literals.
    donor_cols = ["age", "sex", "height", "weight", "bmi", "cause_of_death", "race"]
    cat_donor = catalog.select(
        F.col("uuid"),
        *[F.col(c) for c in donor_cols if c in catalog.columns],
    )
    obs = (
        obs.join(F.broadcast(cat_donor), obs.dataset == cat_donor.uuid, "inner")
        .drop("uuid")
        .withColumn("age", F.col("age").cast("double"))
        .withColumn("object_type", F.lit("ftu"))
        .withColumn("analyte_class", F.lit("Protein"))
    )

    uns = {
        "creation_data_time": creation_time or str(datetime.now()),
        "uuid": product_uuid or str(uuidlib.uuid4()),
        "datasets": processed_hbmids,
        "dataset_uuids": processed_uuids,
        "protocol": "https://github.com/hubmapconsortium/codex-data-products",
        "epic_type": "analyses",
        "tissue": tissue,
    }
    return CodexProduct(
        x_long=x_long,
        obs=obs,
        var=var,
        varm_long=varm_long,
        edges=edges,
        uns=uns,
        varm_raw=varm_raw,
    )


def write_json_atomic(path: str, obj) -> None:
    """Temp-write + atomic rename: a crash mid-write can never leave a
    torn JSON behind — uns.json is READ by every maintenance batch
    (streaming/product_ivm.py), so a corrupt file would make batch
    replay unrecoverable, which the plain open/write allowed."""
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2)
    os.replace(tmp, path)


PRODUCT_TABLES = ("x_long", "obs", "var", "varm_long", "edges")
COMMIT_MARKER = "_PRODUCT_COMMIT.json"


def write_commit_marker(
    out_dir: str,
    uuid: str,
    version: int,
    tables: list[str],
    dataset_uuids: list[str],
) -> None:
    """The commit point of the manifest-last protocol: the marker is the
    LAST file written, via write-temp + atomic rename (POSIX rename is
    atomic within a filesystem; object stores substitute a conditional
    PUT). A reader that doesn't see the marker must treat the directory
    as uncommitted garbage — so a crash anywhere earlier leaves no
    readable half-product. The marker carries the COMMITTED dataset
    list: readers gate partition visibility on it, so uncommitted
    partitions written by an in-flight maintenance batch stay invisible
    until this single rename."""
    tmp = os.path.join(out_dir, f".{COMMIT_MARKER}.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "uuid": uuid,
                "version": version,
                "tables": tables,
                "dataset_uuids": dataset_uuids,
            },
            f,
        )
    os.replace(tmp, os.path.join(out_dir, COMMIT_MARKER))


def read_commit_marker(out_dir: str) -> dict:
    """Raise if the product was never committed (or a write crashed
    before its commit point)."""
    path = os.path.join(out_dir, COMMIT_MARKER)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{out_dir} has no {COMMIT_MARKER}: product is uncommitted "
            "(a build crashed mid-write, or never ran) — re-run the build"
        )
    with open(path) as f:
        return json.load(f)


def read_product_table(spark: SparkSession, out_dir: str, table: str) -> DataFrame:
    """Committed read: consult the marker first, and filter the
    dataset-partitioned tables to the marker's COMMITTED dataset list
    (the simplified Iceberg/Delta snapshot pattern) — a partition
    written by an in-flight maintenance batch that hasn't reached its
    commit point is invisible, via partition pruning, not a row filter."""
    marker = read_commit_marker(out_dir)
    df = spark.read.parquet(f"{out_dir}/{table}")
    if table in ("x_long", "obs", "edges"):
        df = df.filter(F.col("dataset").isin(marker["dataset_uuids"]))
    return df


def write_product(
    product: CodexProduct, out_dir: str, *, _fail_after: str | None = None
) -> dict:
    """K1 + K2: parquet product directory + manifest, committed with the
    manifest-LAST protocol: tables → uns.json → manifest → commit
    marker. A crash at any point leaves no marker, so readers (through
    ``read_product_table``) refuse the half-product, and a re-run
    converges — every table write is mode=overwrite.

    x_long/obs/edges partitioned by dataset → partition pruning for
    per-dataset consumers AND O(delta) incremental maintenance
    (streaming/product_ivm.py); var/varm are channel-grain tables.

    ``_fail_after`` is the failure-injection seam for the atomicity
    test: crash immediately after writing the named step.
    """

    def _checkpoint(step: str) -> None:
        if _fail_after == step:
            raise RuntimeError(f"injected crash after {step}")

    os.makedirs(out_dir, exist_ok=True)
    product.x_long.write.mode("overwrite").partitionBy("dataset").parquet(
        f"{out_dir}/x_long"
    )
    _checkpoint("x_long")
    product.obs.write.mode("overwrite").partitionBy("dataset").parquet(
        f"{out_dir}/obs"
    )
    _checkpoint("obs")
    product.var.write.mode("overwrite").parquet(f"{out_dir}/var")
    product.varm_long.write.mode("overwrite").parquet(f"{out_dir}/varm_long")
    if product.edges is not None:
        product.edges.write.mode("overwrite").partitionBy("dataset").parquet(
            f"{out_dir}/edges"
        )
    _checkpoint("tables")
    write_json_atomic(f"{out_dir}/uns.json", product.uns)
    _checkpoint("uns")

    # K2 manifest (create_json, bin/concatenate.py:154-177): counts are
    # DataFrame actions; file size measured on the written product.
    total_cells = product.obs.count()
    size = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(out_dir)
        for fn in fns
    )
    manifest = {
        "Data Product UUID": product.uns["uuid"],
        "Tissue": product.uns.get("tissue"),
        "Assay": "codex",
        "Creation Time": product.uns["creation_data_time"],
        "Dataset UUIDs": product.uns["dataset_uuids"],
        "Dataset HBMIDs": product.uns["datasets"],
        "Total Cell Count": total_cells,
        "Raw File Size": size,
    }
    write_json_atomic(f"{out_dir}/{product.uns['uuid']}.json", manifest)
    _checkpoint("manifest")
    write_commit_marker(
        out_dir,
        product.uns["uuid"],
        0,
        list(PRODUCT_TABLES),
        list(product.uns["dataset_uuids"]),
    )
    return manifest


def wide_matrix(product: CodexProduct, layer: str = "total") -> DataFrame:
    """P3 export path: the long expression relation pivoted wide — one
    double column per surviving channel, one row per cell (the
    AnnData.X orientation, bin/concatenate.py:266).

    The channel list is plan-time metadata (≤ hundreds), so the pivot
    gets an explicit value list — no extra distinct-scan job, stable
    column order. Missing (cell, channel) pairs materialize as NULL,
    matching the reference's outer-concat NaN semantics (SURVEY U1).
    """
    channels = [r["channel"] for r in product.var.select("channel").collect()]
    channels.sort()
    return (
        product.x_long.groupBy("dataset", "cell_id")
        .pivot("channel", channels)
        .agg(F.first(layer))
    )


def export_h5mu(product: CodexProduct, path: str) -> None:
    """K1 compat sink: the byte-level ``.h5mu`` container
    (reference behavior: bin/concatenate.py:454-456).

    Driver-side by design (SURVEY §4: real products are single-machine
    sized — the reference itself materializes them in RAM). With
    ``anndata``/``mudata`` installed, writes a full-fidelity h5mu;
    without them, falls back to the from-scratch HDF5 codec
    (``sources/minihdf5``), emitting real spec-layout bytes in the
    mudata group convention — ``/mod/<uuid>_raw/X`` plus ``obs``/
    ``var`` groups with an ``_index`` dataset and one dataset per
    column (numeric as f64/i64, everything else as fixed-length
    strings). ``uns`` metadata stays in the parquet layout's
    ``uns.json``; the parquet product written by ``write_product`` is
    the primary, scale-safe format either way.
    """
    import numpy as np

    wide = wide_matrix(product).toPandas()
    obs = product.obs.toPandas().set_index("cell_id")
    var = product.var.toPandas().set_index("channel")
    wide = wide.set_index("cell_id").loc[obs.index]
    mod = f"{product.uns['uuid']}_raw"
    x = wide[var.index].to_numpy(dtype=np.float64)

    try:
        import anndata
        import mudata
    except ImportError:
        from codex_data_products_spark.sources import minihdf5

        def frame_datasets(prefix: str, pdf) -> dict:
            out = {f"{prefix}/_index": np.array([str(i) for i in pdf.index])}
            for col in pdf.columns:
                vals = pdf[col]
                if np.issubdtype(vals.dtype, np.number):
                    out[f"{prefix}/{col}"] = vals.to_numpy()
                else:
                    out[f"{prefix}/{col}"] = np.array(
                        [str(v) for v in vals]
                    )
            return out

        datasets = {f"/mod/{mod}/X": x}
        datasets.update(frame_datasets(f"/mod/{mod}/obs", obs))
        datasets.update(frame_datasets(f"/mod/{mod}/var", var))
        with open(path, "wb") as f:
            f.write(minihdf5.write(datasets))
        return

    adata = anndata.AnnData(X=x, obs=obs, var=var)  # pragma: no cover
    mdata = mudata.MuData({mod: adata})  # pragma: no cover
    mdata.write(path)  # pragma: no cover
