package graft

/** Whole-surface physical-plan audit: structural invariants that hold
  * for EVERY registered query, planned (not executed) on the sf0.001
  * tables. These are the properties the engine's scale story rests on,
  * enforced as a test instead of a review claim:
  *
  *  - no `CartesianProduct` anywhere — every cross join in the repo is
  *    against a broadcast kilobyte frame (mentions, thresholds, scalar
  *    aggregates), which plans as BroadcastNestedLoopJoin; a true
  *    partitioned Cartesian product would be a 100 TB accident;
  *  - no Scala/Python UDF nodes — every kernel is either a built-in
  *    function or a native codegen'd Catalyst expression, so the whole
  *    surface stays inside Tungsten;
  *  - the plan BUILDS for every key (driver-side probe selection and
  *    index builds included) — a registry entry that throws at
  *    planning time would otherwise surface only in the driver's gate.
  */
class PlanAuditSpec extends SparkSpec {

  test("every registered query plans without CartesianProduct or UDF nodes") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => offenders += s"$name: plan build failed: ${e.getMessage}"; "" }
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct in plan"
      if (plan.contains("ScalaUDF") || plan.contains("BatchEvalPython"))
        offenders += s"$name: UDF node in plan"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no registered query plans a partitionless window") {
    // the repo has NO deliberate partitionless windows: every global
    // rank/prefix-sum runs either over a proven-bounded frame via
    // Ranks.boundedRowNumber (no Window node) or as a broadcast
    // prefix-sum self-join (Ranks offsets). So ANY window with an
    // empty partitionSpec surviving to the OPTIMIZED plan is a
    // corpus-sized single-task sort accident, the exact failure mode
    // the WindowExec "No Partition Defined" warning exists to flag —
    // enforced here instead of warning-log review. (Round 11 tried
    // declaring bounded windows with partitionBy(lit(0)); Catalyst
    // constant-folds the literal key away, so the gate inspects the
    // optimized plan and the convention is: don't plan them at all.)
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val bad = fn(spark, sf).queryExecution.optimizedPlan.collectWithSubqueries {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) offenders += s"$name: ${bad.size} partitionless Window node(s)"
      } catch { case e: Throwable => offenders += s"$name: plan build failed: ${e.getMessage}" }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("blob-event keys sort the narrow change-log, never the fabricated wide rows") {
    // the round-13 rewrite's load-bearing property: the global
    // event_id sort runs BELOW the envelope fabricate/parse
    // projections, so the range exchange ships ~60-byte source rows.
    // If a refactor (or a future Catalyst rule) ever re-plans the sort
    // above the fabrication, the sorted frame would carry the derived
    // wide columns — caught here by inspecting every Sort node's
    // output schema in the optimized plan.
    val narrow = Set("event_id", "ts", "ts_ns", "props", "filesystem",
      "path", "is_delete", "user_id", "event_type")
    Seq("blob_event_envelope", "blob_events_to_paths").foreach { name =>
      val sorts = SparkEntry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan.collectWithSubqueries {
          case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s
        }
      assert(sorts.nonEmpty, s"$name: expected a global Sort in the plan")
      sorts.foreach { s =>
        val cols = s.child.output.map(_.name).toSet
        val wide = cols -- narrow
        assert(wide.isEmpty,
          s"$name: Sort input carries fabricated columns $wide — the sort moved above the fabrication")
      }
    }
  }
}
