"""JSON document sources.

Reference source operators (SURVEY.md §2 S1-S6):
  S1 whole-file JSON  getJsonsFromFolder        SchemaDerive.scala:138-139
  S2 NDJSON           getJsonsFromFolderWithNDFiles  SchemaDerive.scala:148-151
  S3 recursive walk   listAllFiles              FileSystemJsonGetters.scala:82-88
  S6 enum-set file    getJArrayFromFile         FileSystemJsonGetters.scala:203-221

Spark-native: ``spark.read.text`` (wholetext or line mode) + pathGlobFilter/
recursiveFileLookup (Spark's FileIndex does the walking). Parse/validate
happens downstream in operators/infer.py — error capture, never exceptions
(P1/P2: single-pass split via the error column, fixing the reference's
double traversal TODO at SchemaGuruRDD.scala:49).
"""

from __future__ import annotations

import json
from typing import List

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_json_dir(spark: SparkSession, path: str,
                  ndjson: bool = False) -> DataFrame:
    """Directory of JSON docs -> DataFrame(path string, content string).

    ndjson=False: one document per FILE (S1, wholetext).
    ndjson=True:  one document per LINE (S2).
    Hidden files are excluded by Spark's FileIndex (as the reference's
    walker excludes them, FileSystemJsonGetters.scala:85).
    """
    reader = (spark.read
              .option("recursiveFileLookup", "true")
              .option("wholetext", str(not ndjson).lower()))
    df = reader.text(path)
    out = df.select(
        F.input_file_name().alias("path"),
        F.col("value").alias("content"),
    )
    if ndjson:
        out = out.where(F.trim("content") != "")
    return out


def read_enum_sets(paths: List[str]) -> list:
    """S6: JSON-array files -> list of enum value lists (driver-side,
    broadcast via SchemaContext.enum_sets)."""
    sets = []
    for p in paths:
        with open(p) as f:
            arr = json.load(f)
        if not isinstance(arr, list):
            raise ValueError(f"{p}: enum set file must hold a JSON array")
        sets.append(arr)
    return sets


def write_keyed_json(df: DataFrame, out_dir: str, key_col: str,
                     value_col: str, partitions: int = 4) -> None:
    """K1 (SchemaDerive.scala:127-129 + RDDMultipleTextOutputFormat): one
    output directory per key. The reference hash-partitioned to 4 and
    wrote one file per key; Spark-native is write.partitionBy(key) —
    output layout ``out_dir/<key_col>=<key>/part-*.txt``."""
    (df.select(F.col(key_col), F.col(value_col).alias("value"))
       .repartition(partitions, F.col(key_col))
       .write.mode("overwrite")
       .partitionBy(key_col)
       .text(out_dir))
