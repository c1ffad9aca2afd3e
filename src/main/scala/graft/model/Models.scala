package graft.model

import java.sql.Timestamp

/** Path-index record.
  *
  * Mirrors the reference's path model
  * (reference: AzureSearchIndexer/IndexDefinitions/PathIndexModel.cs:10-28):
  * `key` is derived as base64(utf8("%2f"-join(filesystem, pathUrlEncoded)))
  * and is filterable + sortable (it drives keyset pagination).
  */
final case class PathIndexRecord(
    key: String,
    pathUrlEncoded: String,
    filesystem: String,
    fileLastModified: Timestamp,
    lastModified: Timestamp)

/** Document index record, mirroring the reference's example index models
  * (reference: IndexModels/TextIndexModel.cs:5-40).
  */
final case class TextIndexRecord(
    pathbase64: String,
    stringvalue: String,
    numbervalue: Long,
    booleanvalue: Boolean)

final case class MappedIndexRecord(
    pathbase64: String,
    stringvalue: String,
    numbervalue: Long,
    booleanvalue: Boolean,
    eTag: String,
    pathUrlEncoded: String,
    lastModified: Timestamp)

/** Indexer run metrics (reference: AzureSearchIndexer/Models/IndexerRunMetrics.cs). */
final case class RunMetrics(
    readCount: Long,
    readFailedCount: Long,
    processedCount: Long,
    uploadCreatedCount: Long,
    uploadModifiedCount: Long,
    uploadFailedCount: Long,
    uploadFailedTooLargeCount: Long)
