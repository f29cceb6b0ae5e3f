package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's in-suite re-measure trigger to the SAME rule the
  * round gate (`tools/check_budget.py`) enforces, so a query can never
  * again drift past the gate without having been re-measured in-suite
  * (VERDICT r11 #3). The constants are read out of the Python source:
  * if either side changes, this spec reds before the round does.
  */
class BenchGateSpec extends AnyFunSuite {

  private def pyConst(name: String): Double = {
    val text = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("tools/check_budget.py")),
      java.nio.charset.StandardCharsets.UTF_8)
    val re = (name + """\s*=\s*([0-9.]+)""").r
    re.findFirstMatchIn(text) match {
      case Some(m) => m.group(1).toDouble
      case None => fail(s"$name not found in tools/check_budget.py")
    }
  }

  test("Bench.Factor equals check_budget.py FACTOR") {
    assert(Bench.Factor === pyConst("FACTOR"))
  }

  test("Bench.AbsSlack equals check_budget.py ABS_SLACK") {
    assert(Bench.AbsSlack === pyConst("ABS_SLACK"))
  }

  test("overBudget matches the python rule: > max(FACTOR*b, b+ABS_SLACK)") {
    // the exact boundary cases that mattered in r11: q68 at 1.672 vs
    // budget 0.822 (limit 1.644) IS a trigger; q80 at 16.057 vs budget
    // 9.91 (limit 19.82) is NOT (over the absolute guard only)
    assert(Bench.overBudget(1.672, 0.822))
    assert(!Bench.overBudget(16.057, 9.91))
    // both guards must be exceeded
    assert(!Bench.overBudget(0.99, 0.5))  // at the max(1.0, 1.0) limit
    assert(Bench.overBudget(1.01, 0.5))
    assert(!Bench.overBudget(3.9, 2.0))   // over +0.5 but under 2x
    assert(Bench.overBudget(4.01, 2.0))
  }
}
