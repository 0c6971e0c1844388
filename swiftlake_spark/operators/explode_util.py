"""Shared blob-explode shape for ingestion operators.

warc_records, webdataset_samples and extract_pdf_images all explode a
binary column into N output rows per blob inside ``mapInPandas``.
The boilerplate (keep-column schema build, per-blob column zip,
row-dict assembly, empty-batch-safe DataFrame emit) lives here once
so a fix to the shape reaches every caller.
"""

from __future__ import annotations


def explode_blobs(df, data_col: str, extra_fields: list, row_fn):
    """Return ``df`` with ``data_col`` exploded: ``row_fn(blob_bytes)``
    yields dicts with keys matching ``extra_fields`` (a list of
    ``pyspark.sql.types.StructField``); all other input columns are
    carried through on every emitted row."""
    import pandas as pd

    from pyspark.sql import types as T

    keep = [f for f in df.schema.fields if f.name != data_col]
    schema = T.StructType(keep + list(extra_fields))
    keep_names = [f.name for f in keep]
    all_names = [f.name for f in schema.fields]

    def run(batches):
        for pdf in batches:
            rows = []
            cols = [pdf[k] for k in keep_names]
            for blob, *keeps in zip(pdf[data_col], *cols):
                if blob is None:
                    continue
                base = dict(zip(keep_names, keeps))
                for extra in row_fn(bytes(blob)):
                    rows.append({**base, **extra})
            yield pd.DataFrame(rows, columns=all_names)

    return df.mapInPandas(run, schema)
