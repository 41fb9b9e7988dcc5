package graft.sources

/** Production [[KafkaEdge.RecordSender]] bound to
  * `org.apache.kafka.clients.producer.KafkaProducer` by REFLECTION:
  * kafka-clients ships with the Kafka connector on real Spark
  * clusters but is absent from this build's compile classpath (and
  * from this sandbox), so the binding happens at first use on the
  * executor, against whatever classloader the task runs under.
  *
  * Semantics mirror the reference's production-exception handler
  * (DeadLetterProductionExceptionHandler.java:26-45 — any producer
  * exception becomes a DLT record with its message, processing
  * continues): a failed construction (no client on the classpath, bad
  * config) or a failed/timed-out send returns `Some(message)`, which
  * [[KafkaEdge.sendWithFallback]] routes to the production DLT with
  * the original key/value preserved. No exception ever escapes into
  * the task.
  *
  * One producer per (executor JVM × sender instance), created lazily
  * and kept for the executor's lifetime (standard long-lived-producer
  * discipline). Sends are acknowledged per record (`Future.get`) —
  * the contract [[KafkaEdge.sendWithFallback]] needs for
  * record-granular DLQ routing; a pipelined variant would keep an
  * in-flight window of futures and report completions at partition
  * close, trading error attribution latency for throughput. */
final class ReflectiveKafkaSender(bootstrap: String, topic: String,
    extra: Map[String, String] = Map.empty,
    sendTimeoutMs: Long = 30000L) extends KafkaEdge.RecordSender {

  @transient private lazy val bound: Either[String,
      (AnyRef, java.lang.reflect.Method, java.lang.reflect.Constructor[_])] =
    try {
      val cl = Option(Thread.currentThread.getContextClassLoader)
        .getOrElse(getClass.getClassLoader)
      val producerCls =
        Class.forName("org.apache.kafka.clients.producer.KafkaProducer", true, cl)
      val recordCls =
        Class.forName("org.apache.kafka.clients.producer.ProducerRecord", true, cl)
      val props = new java.util.Properties()
      props.put("bootstrap.servers", bootstrap)
      val byteSer = "org.apache.kafka.common.serialization.ByteArraySerializer"
      props.put("key.serializer", byteSer)
      props.put("value.serializer", byteSer)
      extra.foreach { case (k, v) => props.put(k, v) }
      val producer = producerCls.getConstructor(classOf[java.util.Properties])
        .newInstance(props).asInstanceOf[AnyRef]
      val send = producerCls.getMethod("send", recordCls)
      val ctor = recordCls.getConstructor(classOf[String],
        classOf[Object], classOf[Object])
      Right((producer, send, ctor))
    } catch { case e: Throwable =>
      Left(s"kafka producer unavailable: ${root(e).toString}")
    }

  private def root(e: Throwable): Throwable =
    if (e.getCause != null && (e.getCause ne e)) root(e.getCause) else e

  override def send(key: Array[Byte], value: Array[Byte]): Option[String] =
    bound match {
      case Left(err) => Some(err)
      case Right((producer, sendM, ctor)) =>
        try {
          val rec = ctor.newInstance(topic, key, value).asInstanceOf[AnyRef]
          sendM.invoke(producer, rec)
            .asInstanceOf[java.util.concurrent.Future[_]]
            .get(sendTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
          None
        } catch {
          // a task kill (Spark cancellation) must ABORT the partition,
          // not convert into a per-record DLT message — otherwise a
          // cancelled task with a hung broker grinds through every
          // remaining record at sendTimeoutMs each. Restore the
          // interrupt flag and rethrow; fatal JVM errors propagate too
          // (NonFatal excludes them).
          case e: InterruptedException =>
            Thread.currentThread().interrupt()
            throw e
          case scala.util.control.NonFatal(e) => Some(root(e).toString)
        }
    }
}
