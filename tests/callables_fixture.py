"""Importable processor/middleware targets for the dotted-path config
tests (reference loads these from YAML/TOML import strings,
core/config.py:81-130)."""

from __future__ import annotations

from pyspark.sql import functions as F


def drop_einstein(items):
    """Item processor: reject Einstein quotes (the reference's
    processor-returns-None rejection, expressed set-wise as a filter)."""
    return items.filter(F.col('author') != 'Albert Einstein')


def tag_items(items):
    return items.withColumn('tagged', F.lit(True))


def passthrough_middleware(fetch):
    def wrapped(df):
        return fetch(df).withColumn('mw_touched', F.lit(True))

    return wrapped


NOT_CALLABLE = 42
