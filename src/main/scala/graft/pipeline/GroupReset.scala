package graft.pipeline

/** Consumer-group offset reset — the reload 3a path end to end
  * (kafka_client.py:360-370): a hot reload moves NO data; it resets
  * the consumer group's committed offsets to the matching dump
  * state's, so consumers resume exactly where the dump ended.
  *
  * The broker call sits behind [[GroupOffsetsAdmin]] because this
  * container ships neither a broker nor the kafka-clients jar: the
  * production impl resolves `AdminClient` reflectively at runtime (the
  * jar travels with the Spark Kafka connector — same string-resolution
  * stance as KafkaIO's `format("kafka")`), while the request
  * CONSTRUCTION — group id, (topic, partition) keys parsed from the
  * state's string-keyed offsets map (kafka_client.py:55-60 writes
  * them as JSON strings; DumpStateSpec pins that), target offsets —
  * is plain code under test (PipelineSpec).
  */
trait GroupOffsetsAdmin {
  /** Set `(topic, partition) -> offset` as the group's committed offsets. */
  def alterConsumerGroupOffsets(
      groupId: String, offsets: Map[(String, Int), Long]): Unit
}

object GroupReset {
  /** Build and apply the reset request from a dump state's offsets
    * map (string partition keys → int partitions). Returns the applied
    * request for observability.
    */
  def apply(
      admin: GroupOffsetsAdmin,
      groupId: String,
      topic: String,
      offsets: Map[String, Long]): Map[(String, Int), Long] = {
    val request = offsets.map { case (p, o) => (topic, p.toInt) -> o }
    admin.alterConsumerGroupOffsets(groupId, request)
    request
  }

  /** Full 3a flow: only a [[HotReload]] resets the group — a data
    * reload re-produced the records, so there is nothing to seek past
    * (kafka_client.py:406-424 branches the same way).
    */
  def applyIfHot(
      admin: GroupOffsetsAdmin,
      groupId: String,
      topic: String,
      result: ReloadResult): Option[Map[(String, Int), Long]] =
    result match {
      case HotReload(offsets) => Some(apply(admin, groupId, topic, offsets))
      case _: Reloaded => None
    }
}

/** Production [[GroupOffsetsAdmin]]: reflective
  * `org.apache.kafka.clients.admin.AdminClient.alterConsumerGroupOffsets`
  * with a blocking wait on the result future — no compile-time
  * dependency on kafka-clients, which is absent from this container.
  */
class AdminClientGroupAdmin(bootstrapServers: String) extends GroupOffsetsAdmin {
  override def alterConsumerGroupOffsets(
      groupId: String, offsets: Map[(String, Int), Long]): Unit = {
    val cl = Thread.currentThread().getContextClassLoader
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrapServers)
    val adminCls = cl.loadClass("org.apache.kafka.clients.admin.AdminClient")
    val admin = adminCls.getMethod("create", classOf[java.util.Properties])
      .invoke(null, props)
    try {
      val tpCtor = cl.loadClass("org.apache.kafka.common.TopicPartition")
        .getConstructor(classOf[String], java.lang.Integer.TYPE)
      val omCtor = cl.loadClass(
          "org.apache.kafka.clients.consumer.OffsetAndMetadata")
        .getConstructor(java.lang.Long.TYPE)
      val jmap = new java.util.HashMap[AnyRef, AnyRef]()
      offsets.foreach { case ((t, p), o) =>
        jmap.put(tpCtor.newInstance(t, Int.box(p)).asInstanceOf[AnyRef],
                 omCtor.newInstance(Long.box(o)).asInstanceOf[AnyRef])
      }
      val result = admin.getClass
        .getMethod("alterConsumerGroupOffsets", classOf[String],
                   classOf[java.util.Map[_, _]])
        .invoke(admin, groupId, jmap)
      val future = result.getClass.getMethod("all").invoke(result)
      future.getClass.getMethod("get").invoke(future) // block until acked
    } finally adminCls.getMethod("close").invoke(admin)
  }
}
