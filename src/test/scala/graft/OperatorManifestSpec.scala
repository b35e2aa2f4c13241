package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard over the operator surface (r14 verdict #7): every operator
  * registered in any engine dispatch must be pinned by at least one driver
  * query or spec, and the committed docs/OPERATORS.md must match what the
  * current sources generate. */
class OperatorManifestSpec extends AnyFunSuite {
  test("every registered operator is pinned by a query or a spec") {
    val orphans = OperatorManifest.unpinned()
    assert(orphans.isEmpty,
      s"registered but unpinned operators (add a query or spec, or remove " +
        s"the dead registration): ${orphans.mkString(", ")}")
  }

  test("docs/OPERATORS.md is current") {
    val want = OperatorManifest.manifest()
    val p = OperatorManifest.repoRoot.resolve("docs/OPERATORS.md")
    val got =
      if (java.nio.file.Files.exists(p))
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      else ""
    assert(got == want,
      "docs/OPERATORS.md is stale — regenerate with " +
        "`sbt \"Test/runMain graft.GenOperators\"`")
  }

  test("sections are non-trivial (extraction regressions fail loudly)") {
    val s = OperatorManifest.sections().map(x => x.title -> x.ops.size).toMap
    assert(s("Typed pipeline stages") >= 45)
    assert(s("Dynamic pipeline stages") >= 45)
    assert(s("Typed expression operators") >= 140)
    assert(s("Dynamic expression operators") >= 140)
    assert(s("Typed match operators") >= 20)
    assert(s("Dynamic match operators") >= 20)
    assert(s("Typed group accumulators & window operators") >= 30)
    assert(s("Dynamic group accumulators") >= 20)
  }
}
