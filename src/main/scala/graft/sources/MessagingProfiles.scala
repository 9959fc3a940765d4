package graft.sources

import graft.sql.Ddl.ConnectorTable

/** Option-surface validation for the messaging connector family, mirroring
  * each reference profile's required/optional pulls:
  *
  *   - kinesis  (kinesis/mod.rs:135-166): stream_name required;
  *     source.offset ∈ earliest|latest; aws_region optional
  *   - fluvio   (fluvio/mod.rs:91-97): topic required; endpoint optional;
  *     source.offset ∈ earliest|latest
  *   - nats     (nats/mod.rs:47-100): servers required; sources take
  *     exactly one of stream (jetstream) | subject (core);
  *     auth.type ∈ none|credentials|jwt with their credential pairs
  *   - mqtt     (mqtt/mod.rs:61-122): url + topic required;
  *     qos ∈ AtMostOnce|AtLeastOnce|ExactlyOnce
  *   - rabbitmq (rabbitmq/mod.rs:105-142): stream required; host/port/
  *     uris optional
  *
  * Returns the (broker address, topic) pair the [[MessageBroker]]-backed
  * DSv2 source/sink runs on.
  */
object MessagingProfiles {

  private def req(t: ConnectorTable, key: String): String =
    t.options.getOrElse(key,
      sys.error(s"table ${t.name}: ${t.connector} requires option '$key'"))

  private def checkOffset(t: ConnectorTable): Unit =
    t.options.get("source.offset").foreach {
      case "earliest" | "latest" => ()
      case o => sys.error(s"invalid value for source.offset '$o' (earliest | latest)")
    }

  def resolve(t: ConnectorTable): (String, String) = t.connector match {
    case "kinesis" =>
      val stream = req(t, "stream_name")
      checkOffset(t)
      (s"kinesis://${t.options.getOrElse("aws_region", "local")}", stream)

    case "fluvio" =>
      val topic = req(t, "topic")
      checkOffset(t)
      (t.options.getOrElse("endpoint", "fluvio://local"), topic)

    case "nats" =>
      val servers = req(t, "servers")
      t.options.getOrElse("auth.type", "none") match {
        case "none" => ()
        case "credentials" => req(t, "auth.username"); req(t, "auth.password")
        case "jwt" => req(t, "auth.jwt"); req(t, "auth.nkey_seed")
        case a => sys.error(s"invalid auth.type '$a' (none | credentials | jwt)")
      }
      val subject = (t.options.get("stream"), t.options.get("subject")) match {
        case (Some(s), None) => s // jetstream consumer
        case (None, Some(s)) => s // core subscription
        case (Some(_), Some(_)) =>
          sys.error("exactly one of 'stream' or 'subject' must be set for nats tables")
        case (None, None) =>
          sys.error("one of 'stream' (jetstream) or 'subject' (core) is required for nats tables")
      }
      (s"nats://$servers", subject)

    case "mqtt" =>
      val url = req(t, "url")
      val topic = req(t, "topic")
      t.options.get("qos").foreach { q =>
        val norm = q.toLowerCase.replace("_", "")
        if (!Set("atmostonce", "atleastonce", "exactlyonce")(norm))
          sys.error(s"invalid value for 'qos': $q")
      }
      t.options.get("sink.retain").foreach { r =>
        if (r != "true" && r != "false") sys.error(s"invalid value for 'sink.retain': $r")
      }
      (url, topic)

    case "rabbitmq" =>
      val stream = req(t, "stream")
      val host = t.options.getOrElse("host",
        t.options.getOrElse("uris", "localhost"))
      (s"rabbitmq://$host", stream)

    case c => sys.error(s"not a messaging connector: $c")
  }

  val connectors: Set[String] = Set("kinesis", "fluvio", "nats", "mqtt", "rabbitmq")
}
