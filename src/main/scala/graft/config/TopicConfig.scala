package graft.config

/** Topic-name configuration (reference:
  * src/main/java/de/tg/kafka/streams/dead/letter/config/TopicConfig.java:6-12
  * bound from src/main/resources/application.yml:14-19). */
final case class TopicConfig(
    input: String = "input",
    output: String = "output",
    processDlt: String = "process-exception.DLT",
    deserializationDlt: String = "deserialization-exception.DLT",
    productionDlt: String = "production-exception.DLT")
