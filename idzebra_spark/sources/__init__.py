from idzebra_spark.sources.corpus import (
    load_documents,
    load_table,
    synth_source_files,
    with_sha256,
)

__all__ = ["load_documents", "load_table", "synth_source_files", "with_sha256"]
