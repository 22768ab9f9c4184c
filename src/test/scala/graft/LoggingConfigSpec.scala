package graft

import org.scalatest.funsuite.AnyFunSuite

/** S23 parity gate: the shipped log4j2 config must keep the reference's
  * rotation contract (main.py:56-71 — midnight rotation, 7 backups,
  * stdout + file, the reference's line format). Asserting on the shipped
  * resource keeps a config edit from silently dropping the contract. */
class LoggingConfigSpec extends AnyFunSuite {

  private lazy val props: java.util.Properties = {
    val in = getClass.getClassLoader.getResourceAsStream("graft-log4j2.properties")
    assert(in != null, "graft-log4j2.properties must ship in the jar resources")
    val p = new java.util.Properties()
    try p.load(in) finally in.close()
    p
  }

  test("rotating file appender: midnight rotation, 7 retained backups") {
    assert(props.getProperty("appender.rolling.type") == "RollingFile")
    // daily date pattern + interval 1 + modulate = rollover at midnight,
    // the TimedRotatingFileHandler(when="midnight") contract
    assert(props.getProperty("appender.rolling.filePattern").endsWith("%d{yyyy-MM-dd}"))
    assert(props.getProperty("appender.rolling.policies.time.type") == "TimeBasedTriggeringPolicy")
    assert(props.getProperty("appender.rolling.policies.time.interval") == "1")
    assert(props.getProperty("appender.rolling.policies.time.modulate") == "true")
    // backupCount=7: prune stamped files beyond the 7 newest
    assert(props.getProperty("appender.rolling.strategy.action.condition.nested.type")
      == "IfAccumulatedFileCount")
    assert(props.getProperty("appender.rolling.strategy.action.condition.nested.exceeds") == "7")
  }

  test("stdout handler + reference line format + mode-postfixed file name") {
    assert(props.getProperty("appender.console.target") == "SYSTEM_OUT")
    // "%(asctime)s %(name)s %(levelname)s - %(message)s"
    val fmt = "%d{yyyy-MM-dd HH:mm:ss,SSS} %c %p - %m%n"
    assert(props.getProperty("appender.console.layout.pattern") == fmt)
    assert(props.getProperty("appender.rolling.layout.pattern") == fmt)
    // extractor-{historical|live}.log via the mode property
    assert(props.getProperty("appender.rolling.fileName")
      == "${logDir}/extractor-${mode}.log")
    assert(props.getProperty("property.mode").contains("historical"))
    // both handlers attached at root, level INFO by default
    assert(props.getProperty("rootLogger.appenderRef.stdout.ref") == "stdout")
    assert(props.getProperty("rootLogger.appenderRef.rolling.ref") == "rolling")
    assert(props.getProperty("rootLogger.level").contains("INFO"))
  }
}
