from .source_table import read_source_files, infer_lang, content_bytes  # noqa: F401
