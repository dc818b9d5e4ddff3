"""CDC / incremental-ingest engine: change-event transforms, lake sink
with snapshot-manifest commits, micro-batch replay loop."""

from opendataloader_pdf_spark.cdc.events import (  # noqa: F401
    dedup_events,
    last_writer_wins,
    reduce_batch,
)
from opendataloader_pdf_spark.cdc.patches import (  # noqa: F401
    merge_pending,
    reduce_batch_patches,
    resolve_patches,
)
from opendataloader_pdf_spark.cdc.storage import (  # noqa: F401
    ConcurrentCommitError,
    ParquetMergeSink,
)
from opendataloader_pdf_spark.cdc.mor import MergeOnReadSink  # noqa: F401
from opendataloader_pdf_spark.cdc.engine import ReplayEngine  # noqa: F401
from opendataloader_pdf_spark.cdc.iceberg import IcebergSink  # noqa: F401
from opendataloader_pdf_spark.cdc.maintenance import (  # noqa: F401
    expire_snapshots,
    orphan_files,
    read_at,
    remove_orphans,
    drop_tag,
    read_tag,
    rescale_buckets,
    retained_snapshots,
    schema_at,
    tag,
    tags,
    vacuum_tombstones,
)
from opendataloader_pdf_spark.cdc.wap import (  # noqa: F401
    abort as abort_staged,
    begin_staged,
    publish,
    staged_commits,
)
from opendataloader_pdf_spark.cdc.txn import (  # noqa: F401
    abort_all,
    commit_all,
    recover,
)
from opendataloader_pdf_spark.cdc.ddl import (  # noqa: F401
    DdlEvent,
    assign_epochs,
    collect_timeline,
    parse_ddl,
    registry_from_timeline,
    replay_ddl_stream,
)
from opendataloader_pdf_spark.cdc.changelog import (  # noqa: F401
    apply_changes,
    changed_buckets,
    changes_between,
    commits_between,
    delta_counts,
    apply_delta_state,
    follow_changes,
)
from opendataloader_pdf_spark.cdc.redrive import (  # noqa: F401
    redrive_quarantine,
)
