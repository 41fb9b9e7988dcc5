package graft.config

import java.io.StringReader
import java.nio.file.{Files, Paths}
import java.util.Properties

/** Topic-name configuration (reference:
  * src/main/java/de/tg/kafka/streams/dead/letter/config/TopicConfig.java:6-12
  * bound from src/main/resources/application.yml:14-19). */
final case class TopicConfig(
    input: String = "input",
    output: String = "output",
    processDlt: String = "process-exception.DLT",
    deserializationDlt: String = "deserialization-exception.DLT",
    productionDlt: String = "production-exception.DLT")

object TopicConfig {

  /** Key names mirror the reference's `topics.*` block
    * (application.yml:14-19), flattened to properties form — the
    * Spark-world analog of Spring's @ConfigurationProperties("topics")
    * binding. Missing keys keep their defaults. */
  def fromProperties(props: Properties): TopicConfig = {
    val d = TopicConfig()
    def get(k: String, dflt: String) =
      Option(props.getProperty(s"topics.$k")).map(_.trim).filter(_.nonEmpty)
        .getOrElse(dflt)
    TopicConfig(
      input = get("input", d.input),
      output = get("output", d.output),
      processDlt = get("process-exception", d.processDlt),
      deserializationDlt =
        get("deserialization-exception", d.deserializationDlt),
      productionDlt = get("production-exception", d.productionDlt))
  }

  /** Load from a `.properties` file (or any properties-format text). */
  def load(path: String): TopicConfig = {
    val props = new Properties()
    props.load(new StringReader(Files.readString(Paths.get(path))))
    fromProperties(props)
  }
}
