from .manifest import (  # noqa: F401
    completed_units,
    load_all_manifests,
    write_unit_manifest,
    read_unit_manifest,
    unit_blocks_path,
    unit_manifest_path,
)
