package graft.props

import graft.SparkSpec
import graft.operators.Web
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based check of [[Web.parseRobots]] + [[Web.robotsAllowed]]
  * against an INDEPENDENT in-memory RFC 9309 interpreter that parses
  * the same rendered robots.txt text (so stacked `User-agent:` header
  * runs, empty groups, group-less leading directives and `Crawl-delay`
  * emerge from the text, not from the generator's structure — the
  * round-7 falsifier, an empty specific group next to a `*` group,
  * is now generated routinely).
  *
  * 100 cases × 4 hosts per case = 400 robots files per run, each case
  * one small Spark job (the whole batch of hosts and paths evaluates
  * in a single collect).
  */
object RobotsProps extends Properties("robots") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(100)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // ---- generator: group lists rendered to robots.txt text ----------

  private case class Group(agents: List[String],
                           rules: List[(String, String)],
                           delay: Option[Int])

  private val prefixGen = Gen.oneOf("/", "/a", "/a/", "/a/b", "/a/b/c",
    "/b", "/b/y", "/c",
    // RFC 9309 §2.2.3 special characters: any-sequence and end anchor
    "/*/y", "/a/*.x$", "/a$", "/*", "/b/y$",
    // query-targeting rules (§2.2.2: the match target is path + '?' +
    // query) — plain-prefix, wildcard and end-anchored forms
    "/a?x", "/*?sid=", "/*?*", "/a/b?x=1&y=2$")
  private val ruleGen = Gen.zip(Gen.oneOf("Allow", "Disallow"), prefixGen)
  private val agentGen = Gen.oneOf("graftbot", "*", "otherbot")
  private val groupGen = for {
    nA <- Gen.chooseNum(1, 2)
    agents <- Gen.listOfN(nA, agentGen)
    n <- Gen.chooseNum(0, 3)
    rules <- Gen.listOfN(n, ruleGen)
    delay <- Gen.option(Gen.chooseNum(1, 5))
  } yield Group(agents.distinct, rules, delay)
  private val robotsGen = Gen.chooseNum(0, 3)
    .flatMap(n => Gen.listOfN(n, groupGen))
  private val pathGen = Gen.oneOf("/a/b/c", "/a/b", "/a/x", "/b/y",
    "/c", "/", "/d", "/a", "/a/c.x", "/a/c.xy", "/q/y",
    // query-bearing URLs: the engine must re-attach the parsed query
    // to the path before matching (the model matches the raw string)
    "/a?x=1", "/a?sid=7", "/a/b?x=1&y=2", "/?q=1", "/b/y?sid=2")

  private def render(groups: List[Group]): String =
    groups.map { g =>
      g.agents.map(a => s"User-agent: $a\n").mkString +
        g.rules.map { case (r, p) => s"$r: $p\n" }.mkString +
        g.delay.map(d => s"Crawl-delay: $d\n").getOrElse("")
    }.mkString("\n")

  // ---- independent RFC 9309 interpreter over the rendered text -----

  private case class G(agents: Set[String],
                       rules: List[(String, String)],
                       delays: List[Double])

  private val UaLine = "(?i)^user-agent\\s*:\\s*(\\S+)$".r
  private val RuleLine = "(?i)^(allow|disallow|crawl-delay)\\s*:\\s*(\\S*)$".r

  private def refGroups(body: String): List[G] = {
    var groups = List.empty[G]
    var cur: Option[G] = None
    var lastWasUa = false
    body.split("\n", -1).foreach { raw =>
      val line = raw.replaceAll("#.*$", "").trim
      line match {
        case UaLine(name) =>
          if (lastWasUa && cur.isDefined)
            cur = cur.map(g => g.copy(agents = g.agents + name.toLowerCase))
          else {
            groups = groups ++ cur.toList
            cur = Some(G(Set(name.toLowerCase), Nil, Nil))
          }
          lastWasUa = true
        case RuleLine(r, v) =>
          // a rule line — even an empty-valued one — ends a header run
          lastWasUa = false
          cur = cur.map { g =>
            if (v.isEmpty) g
            else if (r.equalsIgnoreCase("crawl-delay"))
              g.copy(delays = g.delays :+ v.toDouble)
            else g.copy(rules = g.rules :+ ((r.toLowerCase, v)))
          }
        case _ => () // blank/comment: header runs survive these
      }
    }
    groups ++ cur.toList
  }

  /** §2.2.3 pattern match: plain prefix byte-wise, `*` any sequence,
    * trailing `$` end anchor, mid-pattern `$` literal.
    */
  private def patMatches(pattern: String, path: String): Boolean =
    if (!pattern.contains("*") && !pattern.endsWith("$"))
      path.startsWith(pattern)
    else {
      val hasEnd = pattern.endsWith("$")
      val body = if (hasEnd) pattern.dropRight(1) else pattern
      val rex = "^" + body.split("\\*", -1)
        .map(java.util.regex.Pattern.quote).mkString(".*") +
        (if (hasEnd) "$" else "")
      java.util.regex.Pattern.compile(rex).matcher(path).find()
    }

  /** (allowed, crawl_delay) for `agent` fetching `path`: specific
    * groups (even empty) shadow `*`; matching groups combine; the
    * longest matching PATTERN (special chars counted) wins with allow
    * on ties; no match ⇒ allowed; delay = max of the selected groups'
    * delays.
    */
  private def refDecision(groups: List[G], agent: String,
                          path: String): (Boolean, Option[Double]) = {
    val spec = groups.filter(_.agents.contains(agent))
    val app = if (spec.nonEmpty) spec
      else groups.filter(_.agents.contains("*"))
    val matches = app.flatMap(_.rules)
      .filter { case (_, p) => patMatches(p, path) }
    val allowed = matches.isEmpty || {
      val maxLen = matches.map(_._2.length).max
      matches.exists { case (r, p) => p.length == maxLen && r == "allow" }
    }
    val delays = app.flatMap(_.delays)
    (allowed, if (delays.isEmpty) None else Some(delays.max))
  }

  property("robotsAllowed + parseRobots agree with the RFC 9309 " +
      "interpreter on allowed AND crawl_delay") =
    Prop.forAll(Gen.listOfN(4, robotsGen), Gen.listOfN(4, pathGen)) {
      (groupLists, paths) =>
        val bodies = groupLists.map(render)
        val hostRows = bodies.zipWithIndex
          .map { case (b, h) => (s"h$h.com", b) }
        val rules = Web.parseRobots(hostRows.toDF("host", "robots"),
          "host", "robots")
        val urlRows = for {
          h <- bodies.indices
          (p, pi) <- paths.zipWithIndex
        } yield ((h * paths.size + pi).toLong, s"https://h$h.com$p")
        val got = Web.robotsAllowed(urlRows.toDF("id", "url"), "url",
            rules, "graftbot")
          .select("id", "allowed", "crawl_delay")
          .as[(Long, Boolean, Option[Double])].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        val models = bodies.map(refGroups)
        urlRows.forall { case (id, _) =>
          val h = (id / paths.size).toInt
          val p = paths((id % paths.size).toInt)
          got(id) == refDecision(models(h), "graftbot", p)
        }
    }
}
