package graft.model

/** In-flight success/failure sum type for the error-channel pipeline.
  *
  * Mirrors the reference's generic wrapper record
  * (reference: src/main/java/de/tg/kafka/streams/dead/letter/errorhandling/MessageWrapper.java:3-30)
  * with one deliberate change: the reference carries a live
  * `java.lang.Exception`; Spark rows cannot carry JVM exceptions across
  * a shuffle, so the error is rendered to `"<class FQN>: <message>"` at
  * wrap time — exactly the string the reference itself ultimately emits
  * into the `error.message` header
  * (reference: .../errorhandling/ErrorMessageMapper.java:27-30).
  *
  * As a case class of Options it maps to a nullable StructType via
  * `Encoders.product`, so the same type works in `Dataset[…]` pipelines
  * and as a `struct(original, mapped, error)` column in DataFrame code.
  */
final case class MessageWrapper[V, M](
    originalValue: Option[V],
    mappedValue: Option[M],
    error: Option[String]) {
  /** reference: MessageWrapper.java:5-7 (`hasError` ⇔ exception != null) */
  def hasError: Boolean = error.isDefined
}

object MessageWrapper {
  /** reference: MessageWrapper.java builder `success` path */
  def success[V, M](original: V, mapped: M): MessageWrapper[V, M] =
    MessageWrapper(Some(original), Some(mapped), None)

  /** reference: MessageWrapper.java builder `fail` path; rendering per
    * ErrorMessageMapper.java:27-30. */
  def fail[V, M](original: V, e: Throwable): MessageWrapper[V, M] =
    MessageWrapper(Some(original), None, Some(render(e)))

  /** `<exception class FQN>: <message>` — the exact observable format
    * asserted by the reference tests ("java.lang.IllegalArgumentException: -1",
    * reference: src/test/java/.../ErrorHandlingTopologyTest.java:58). */
  def render(e: Throwable): String = e.getClass.getName + ": " + e.getMessage

  /** Wrap an arbitrary total-or-throwing function into the sum type —
    * the Dataset-typed analog of the reference's try/catch mapper
    * (reference: .../topology/ErrorHandlingMapper.java:12-27). */
  def wrap[V, M](f: V => M): V => MessageWrapper[V, M] = { v =>
    try success(v, f(v))
    catch { case scala.util.control.NonFatal(e) => fail(v, e) }
  }
}
