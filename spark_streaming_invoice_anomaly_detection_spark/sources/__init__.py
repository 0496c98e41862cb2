"""Source & sink adapters (SURVEY.md §2.1)."""

from .catalog import load_table, load_tables, register_views
from .csv_batch import load_and_featurize_training_csv, load_training_csv
from .replay import PacedReplayProducer, replay_file_paced

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "load_training_csv",
    "load_and_featurize_training_csv",
    "PacedReplayProducer",
    "replay_file_paced",
]
