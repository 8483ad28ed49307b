package graft.tools

import java.nio.file.{Files, Paths}

/** Regenerate the CLI demo inputs under target/cli_demo (the verify
  * skill's surface 2): a flagship join query plus the TpchLake mappings/
  * config rendered for a chosen sf directory. */
object DemoGen {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val dir = Paths.get("target/cli_demo")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("query.sparql"),
      """PREFIX g: <http://graft.io/schema/>
        |SELECT ?cname ?total WHERE {
        |  ?o g:customer ?c . ?o g:totalprice ?total .
        |  ?c g:custName ?cname .
        |  FILTER(?total > 400000)
        |} ORDER BY DESC(?total) LIMIT 10
        |""".stripMargin)
    Files.writeString(dir.resolve("mappings.ttl"), graft.fixtures.TpchLake.mappingsText(sf))
    Files.writeString(dir.resolve("config.json"), graft.fixtures.TpchLake.configText(sf))
    println(s"wrote target/cli_demo for $sf")
  }
}
