package graft

/** In-memory shard-iterator service — the test double behind the
  * Kinesis-shaped connector contract test
  * ([[graft.streaming.ShardSpoolConnector]]). Models exactly the two
  * behaviors a file or socket transport never exhibits:
  *
  *  - RESHARDING: `split` closes a shard and opens two children over
  *    its halved hash-key range; `merge` closes two ADJACENT shards and
  *    opens one child over their union (the Kinesis scale-down, whose
  *    child carries TWO parents); later puts route to the open shard
  *    owning the key's hash, so one key's records span parent(s) →
  *    one child in sequence order.
  *  - AT-LEAST-ONCE GetRecords: reads are position-based; a consumer
  *    that re-polls from an uncommitted position receives the same
  *    records again.
  *
  * `callLog` records every getRecords target so specs can assert the
  * consumer's parent-before-child discipline.
  */
final class KinesisSim {
  private final class Shard(val id: String, val parents: Seq[String],
                            val lo: Int, val hi: Int) {
    var closed = false
    var recs: Vector[(String, String)] = Vector.empty
  }

  private var seq = 0L
  private var nextId = 1
  private val shards = scala.collection.mutable.LinkedHashMap(
    "shard-0" -> new Shard("shard-0", Nil, 0, 1 << 16))
  val callLog: scala.collection.mutable.ArrayBuffer[String] =
    scala.collection.mutable.ArrayBuffer.empty

  /** Route by partition-key hash to the open shard owning its range;
    * returns the assigned (zero-padded) sequence number.
    */
  def put(partitionKey: String, jsonLine: String): String = synchronized {
    val h = math.floorMod(partitionKey.hashCode, 1 << 16)
    val s = shards.values.find(s => !s.closed && h >= s.lo && h < s.hi)
      .getOrElse(sys.error(s"no open shard covers $partitionKey"))
    seq += 1
    val sq = f"$seq%020d"
    s.recs :+= ((sq, jsonLine))
    sq
  }

  /** Close `id`, open two children over its halved range. */
  def split(id: String): (String, String) = synchronized {
    val s = shards(id)
    require(!s.closed, s"$id already closed")
    s.closed = true
    val mid = (s.lo + s.hi) / 2
    val a = new Shard(s"shard-$nextId", Seq(id), s.lo, mid); nextId += 1
    val b = new Shard(s"shard-$nextId", Seq(id), mid, s.hi); nextId += 1
    shards(a.id) = a
    shards(b.id) = b
    (a.id, b.id)
  }

  /** Close two ADJACENT open shards, open one child over their union —
    * the Kinesis merge; the child carries BOTH parent ids.
    */
  def merge(idA: String, idB: String): String = synchronized {
    val (a, b) = (shards(idA), shards(idB))
    require(!a.closed && !b.closed, s"$idA/$idB: both must be open")
    require(a.hi == b.lo || b.hi == a.lo, s"$idA/$idB are not adjacent")
    a.closed = true; b.closed = true
    val child = new Shard(s"shard-$nextId", Seq(idA, idB),
      math.min(a.lo, b.lo), math.max(a.hi, b.hi)); nextId += 1
    shards(child.id) = child
    child.id
  }

  def service: graft.streaming.ShardService = new graft.streaming.ShardService {
    override def listShards(): Seq[(String, Seq[String], Boolean)] =
      KinesisSim.this.synchronized {
        shards.values.map(s => (s.id, s.parents, s.closed)).toSeq
      }
    override def getRecords(shardId: String, afterSeq: String,
                            limit: Int): Seq[(String, String)] =
      KinesisSim.this.synchronized {
        callLog += shardId
        shards(shardId).recs.filter(_._1 > afterSeq).take(limit)
      }
  }
}
