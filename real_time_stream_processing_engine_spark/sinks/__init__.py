from .writers import (  # noqa: F401
    stream_to_files,
    write_results,
    write_results_with_provenance,
    write_training_shards,
)
