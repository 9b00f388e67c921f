package graft.model

/** STAC domain model (ref generator.py:111-262, 736-957): the catalog →
  * collection → item → asset tree, flattened into case classes with
  * foreign-key columns so the tree is a pair of Datasets rather than a
  * driver-held object graph. The JSON tree layout is a sink concern
  * (graft.sink.StacJsonSink); parent/child links live as `collection`
  * ids here.
  */
final case class StacAsset(
    key: String,            // asset key inside the item ("data", "cog", "thumbnail")
    href: String,
    media_type: String,
    title: String,
    roles: Seq[String],
    checksum: String,       // blockwise multihash (F14); null until enriched (E3)
    size: Long,             // bytes; -1 until enriched (E3)
    extra: Map[String, String]) // forecast:*/custom:* extras incl. band stats (E2)

final case class StacItem(
    id: String,
    collection: String,     // fk → StacCollection.id (ref generator.py:261)
    geometry: String,       // GeoJSON string (F12)
    bbox: Seq[Double],      // [w, s, e, n]
    datetime: String,       // RFC3339 (F5 datetimeToStr)
    properties: Map[String, String],
    assets: Seq[StacAsset])

final case class StacCollection(
    id: String,
    title: String,
    description: String,
    license: String,
    bbox: Seq[Double],
    temporal_start: String, // RFC3339; collection temporal extent (A3/A4)
    temporal_end: String,
    extra: Map[String, String], // e.g. custom:hemisphere (ref generator.py:656)
    // collection-level assets: the first item's thumbnail is promoted
    // here when no thumbnail exists yet (W3, ref generator.py:798-803,
    // 944-957)
    assets: Seq[StacAsset] = Seq.empty)

final case class StacCatalog(
    id: String,
    description: String,
    collections: Seq[String]) // child collection ids
