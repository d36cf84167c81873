package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reverse-DNS enrichment — the reference's J2 operator
  * (core/aggregator.go:68-75): present in the source but commented out
  * behind a "SLOW" note (`names, err := net.LookupAddr(event.Address)`,
  * first PTR name into `event.Hostname` — a field that no longer even
  * exists in models/event.go:7-21; the code is fully bit-rotted). It was
  * slow for a structural reason: one synchronous lookup PER EVENT inside
  * the ingest flush loop, so a hot address pays the round-trip thousands
  * of times and the flush stalls on the slowest resolver answer.
  *
  * The Spark-first shape fixes exactly that: resolve the DISTINCT
  * address relation (|addresses| ≪ |events| — the reference's own report
  * counts a few hundred addresses against millions of events), then
  * broadcast the resolved dimension back onto the events. Lookups run
  * inside `mapPartitions` (genuinely imperative blocking IO — the
  * documented last-resort case), each distinct address exactly once per
  * partition-set, never per event, and never on the ingest hot path —
  * this is an offline backfill like [[GeoIp.backfill]], not a stream
  * stage.
  *
  * Parity note: Go's `net.LookupAddr` returns PTR names with a trailing
  * dot and takes `names[0]`; the [[ReverseDns.SystemResolver]] returns
  * the JVM's canonical hostname (no trailing dot, forward-confirmed).
  * With the reference path dead there is no observable behavior to
  * match, so the cleaner JVM convention stands; any other policy plugs
  * in as a [[ReverseDns.Resolver]] (which is also how the specs inject
  * a deterministic fake — CI containers have no DNS egress).
  *
  * 100 TB shape: one distinct-aggregate shuffle over the address column,
  * |addresses| resolver calls spread across its partitions, one
  * broadcast equi-join back. The events relation is scanned once and
  * never shuffled.
  */
object ReverseDns {

  /** Pluggable resolution strategy; implementations must be serializable
    * (they ship to executors inside the mapPartitions closure). */
  trait Resolver extends Serializable {
    /** PTR name for `ip`, or None when unresolvable (NXDOMAIN, timeout,
      * malformed input — callers treat all three identically, like the
      * reference's silent `err != nil` skip). */
    def resolve(ip: String): Option[String]
  }

  /** JVM resolver: reverse lookup via InetAddress, None when the
    * resolver answers with the literal back (the JVM's "no PTR record"
    * signal) or throws. Never propagates an exception — a poisoned
    * address must not fail a backfill task. */
  object SystemResolver extends Resolver {
    /** Accept only IP literals: `getByName` on anything else does a
      * FORWARD lookup (and maps "" to loopback) — the wrong operation
      * entirely for a PTR enrichment. Octets are range-checked 0-255
      * (ADVICE r11): `999.999.999.999` shape-matches four dotted groups
      * but is NOT a literal to the JVM, so without the range check it
      * would fall through to an accidental forward lookup on garbage
      * before the catch-all returned None. IPv6 literals must parse as
      * hex groups for the same reason — a bare ":" in a log token is
      * not license to resolve it. */
    private[enrich] def isIpLiteral(s: String): Boolean = {
      if (s == null || s.isEmpty) return false
      if (s.contains(":"))
        // IPv6: hex/colon/dot whitelist with >= 2 colons (every valid
        // v6 literal has them; no hostname can contain one). Validated
        // structurally, never resolved to decide — garbage that merely
        // contains a colon no longer reaches getByName at all.
        s.matches("""(?i)[0-9a-f:.]+""") && s.count(_ == ':') >= 2
      else if (!s.matches("""\d{1,3}(\.\d{1,3}){3}""")) false
      else s.split('.').forall(o => o.toInt <= 255)
    }

    def resolve(ip: String): Option[String] =
      if (!isIpLiteral(ip)) None
      else try {
        val h = java.net.InetAddress.getByName(ip).getCanonicalHostName
        if (h == null || h == ip) None else Some(h)
      } catch { case _: Exception => None }
  }

  /** The resolved dimension: one row per distinct non-null address,
    * hostname null when unresolvable. This is the expensive half —
    * |addresses| blocking lookups — sized by the distinct relation,
    * never the event count. */
  def resolveDistinct(events: DataFrame, resolver: Resolver = SystemResolver,
      addrCol: String = "address"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(addrCol).cast("string").as("address"))
      .filter(col("address").isNotNull)
      .distinct()
      .as[String]
      .mapPartitions { it =>
        // per-partition memo: distinct() upstream already guarantees
        // global uniqueness; the map here is belt-and-braces against a
        // caller passing a non-distinct relation directly
        val seen = scala.collection.mutable.HashMap.empty[String, String]
        it.map { ip =>
          val h = seen.getOrElseUpdate(ip, resolver.resolve(ip).getOrElse(""))
          (ip, if (h.isEmpty) null else h)
        }
      }
      .toDF("address", "hostname")
  }

  /** One-shot hostname backfill over an events table (the [[GeoIp
    * .backfill]] pattern): adds/overwrites a `hostname` column by
    * broadcast-joining the resolved distinct dimension. Unresolvable and
    * null addresses get a null hostname. */
  def backfill(events: DataFrame, resolver: Resolver = SystemResolver,
      addrCol: String = "address"): DataFrame = {
    val dim = resolveDistinct(events, resolver, addrCol)
      .withColumnRenamed("address", "__rdns_addr")
    events.drop("hostname")
      .join(broadcast(dim), col(addrCol) === col("__rdns_addr"), "left_outer")
      .drop("__rdns_addr")
  }
}
