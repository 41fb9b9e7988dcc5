package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.TopicConfig

/** External config binding — the analog of the reference's
  * @ConfigurationProperties("topics") bound from application.yml:14-19
  * (same flattened key names). */
class TopicConfigSpec extends AnyFunSuite {

  test("defaults match the reference topic names") {
    val c = TopicConfig()
    assert(c.input == "input" && c.output == "output")
    assert(c.processDlt == "process-exception.DLT")
    assert(c.deserializationDlt == "deserialization-exception.DLT")
    assert(c.productionDlt == "production-exception.DLT")
  }

  test("load binds topics.* keys from a properties file, defaults fill gaps") {
    val f = java.nio.file.Files.createTempFile("graft-topics", ".properties")
    java.nio.file.Files.writeString(f,
      """topics.input=in-v2
        |topics.output=out-v2
        |topics.process-exception=pe.DLT
        |""".stripMargin)
    val c = TopicConfig.load(f.toString)
    assert(c.input == "in-v2" && c.output == "out-v2")
    assert(c.processDlt == "pe.DLT")
    // unspecified keys keep reference defaults
    assert(c.deserializationDlt == "deserialization-exception.DLT")
    assert(c.productionDlt == "production-exception.DLT")
  }
}
