package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, CaseWhen, Cast, EqualNullSafe, EqualTo, Expression, Literal, Or, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.StreamBatchBridge
import org.apache.spark.sql.types.LongType

/** SQL `MERGE INTO <journal table> USING … ON … WHEN …` →
  * [[graft.journal.JournalStore.merge]] (touched-file pruning, no-op
  * suppression, CAS re-derivation), and SQL `UPDATE <journal table>
  * SET … WHERE …` → an append of the rewritten current state — both via
  * the same session-extension pattern as [[JournalDeleteRule]].
  *
  * The journal table advertises ACCEPT_ANY_SCHEMA (INSERT must be able
  * to project the writer columns, engine columns excluded), and Spark's
  * analyzer deliberately SKIPS MergeIntoTable expression resolution for
  * such targets — the table's framework is expected to resolve the
  * clauses itself (Delta's DeltaAnalysis does exactly this, for exactly
  * this reason). So this rule receives the merge with its condition /
  * assignments still unresolved and resolves them in place: attribute
  * references against the (aliased) child outputs through a
  * LocalRelation scope — attribute ids are preserved and no journal
  * relation is re-planned during the nested analyzer run — with SQL's
  * own scoping (ON and WHEN MATCHED see both sides, INSERT values see
  * the source only).
  *
  * Supported shape (anything else refuses with a precise error, never a
  * silent semantic drift):
  *   - `ON t.ns = s.ns AND t.ukey = s.ukey` — exactly the store's merge
  *     key, equality only (either column order; `<=>` accepted).
  *   - `WHEN MATCHED [AND cond] THEN DELETE` — cond may reference
  *     source columns (carried into the merge source, auto-carried
  *     when not among the projected record columns) and the target's
  *     ns/ukey/payload/ts/val (a ts/val reference widens state
  *     reconstruction to the full record — the late-arrival guard
  *     `WHEN MATCHED AND t.ts < s.ts` works).
  *   - `WHEN MATCHED [AND cond] THEN UPDATE SET … / SET *` — the gate
  *     shares DELETE's scope; assignments take ts/payload/val from
  *     source-only expressions (whole-record semantics: the appended
  *     update row IS the record). ANY NUMBER of conditional
  *     UPDATE/DELETE clauses compose first-match-wins: each clause's
  *     masked gate selects that clause's own projected value carriers
  *     inside the routing join.
  *   - `WHEN NOT MATCHED [AND cond] THEN INSERT … / INSERT *` — the
  *     gate sees the source only (no target row exists on this route);
  *     same assignment columns. N conditional INSERT clauses compose
  *     first-match-wins as a projection-time CASE. UPDATE and INSERT
  *     values may differ (per-route carriers).
  *   - `WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE / UPDATE
  *     SET …` — the full-reconciliation clauses: state keys absent
  *     from the source tombstone (DELETE) or rewrite through
  *     TARGET-scope assignments (UPDATE; unassigned columns ride
  *     current values, so the state side widens to the full record and
  *     ts/val become visible to conditions). Same first-match-wins
  *     gate algebra as the matched clauses. State pruning is
  *     structurally OFF here (the complement is the product) — DELETE
  *     reads the checkpoint-bounded latest(), UPDATE the full-record
  *     segment arg-max.
  *   - Clause order honors SQL first-match-wins: an unconditional
  *     clause shadows everything after it; a conditional UPDATE before
  *     DELETE routes gate-failing matches to the DELETE clause.
  *   - `MERGE WITH SCHEMA EVOLUTION` (Delta's autoMerge): assignments
  *     may target store-evolved extras and brand-new column names —
  *     both ride the merge delta (append-time evolution; old rows read
  *     NULL; deletes tombstone extras; extras join the no-op
  *     decision), UPDATE/INSERT must evolve the same column set, and
  *     `SET * / INSERT *` expand to every source column by name.
  * Engine-assigned columns (seq/epoch/skey) cannot be assigned.
  *
  * Installed by `spark.sql.extensions=graft.expr.GraftExtensions`. */
class JournalMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case m: MergeIntoTable if m.childrenResolved =>
      EliminateSubqueryAliases(m.targetTable) match {
        case r: DataSourceV2Relation if r.table.isInstanceOf[JournalTable] =>
          new JournalMergeSupport(spark)
            .translateMerge(m, r.table.asInstanceOf[JournalTable])
        case _ => m
      }
    case u: UpdateTable
        if u.table.resolved && u.assignments.forall(_.resolved) &&
          u.condition.forall(_.resolved) =>
      EliminateSubqueryAliases(u.table) match {
        case r: DataSourceV2Relation if r.table.isInstanceOf[JournalTable] =>
          new JournalMergeSupport(spark)
            .translateUpdate(u, r.table.asInstanceOf[JournalTable])
        case _ => u
      }
  }
}

private[sources] class JournalMergeSupport(spark: SparkSession) {
  import JournalMergeSupport._

  /** Resolve `exprs` against exactly `attrs` (which keep their child
    * qualifiers — `t.x` / `s.x` resolve naturally). A LocalRelation
    * scope keeps the nested analyzer run away from the journal
    * relations (no re-planning, attribute ids preserved) while still
    * giving function lookup and type coercion. */
  private def resolveScoped(exprs: Seq[Expression],
                            attrs: Seq[Attribute]): Seq[Expression] = {
    if (exprs.forall(_.resolved)) return exprs
    val aliased = exprs.map(e => Alias(e, "__r")())
    val analyzed = spark.sessionState.analyzer
      .execute(Project(aliased, LocalRelation(attrs)))
    val out = analyzed match {
      case p: Project => p.projectList.map {
        case a: Alias => a.child
        case o => o
      }
      case other =>
        fail(s"journal MERGE: internal resolution failure (${other.nodeName})")
    }
    out.foreach { e =>
      if (!e.resolved) {
        val missing = e.collect { case u: UnresolvedAttribute => u.sql }
        fail(s"journal MERGE cannot resolve ${missing.mkString(", ")} " +
          s"against [${attrs.map(_.sql).mkString(", ")}] — check the " +
          "clause's scope (INSERT values see the source only; ON and " +
          "WHEN MATCHED see both sides)")
      }
    }
    out
  }
  private def resolve1(e: Expression, attrs: Seq[Attribute]): Expression =
    resolveScoped(Seq(e), attrs).head

  def translateMerge(m: MergeIntoTable, table: JournalTable): LogicalPlan = {
    // WITH SCHEMA EVOLUTION (Delta's autoMerge surface): assignments may
    // target columns beyond the canonical record — brand-new names and
    // store-evolved extras both ride the merge delta (the store's
    // append evolves the pinned DDL; old rows read NULL; deletes
    // tombstone extras; extras join the no-op decision)
    val evolve = m.withSchemaEvolution
    val tAttrs = m.targetTable.output
    val sAttrs = m.sourceTable.output
    val both = tAttrs ++ sAttrs
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet

    // ---- ON: exactly {ns, ukey} equated across the two sides
    val onCond = resolve1(m.mergeCondition, both)
    require(!SubqueryExpression.hasSubquery(onCond),
      "journal MERGE does not support subqueries in the ON condition")
    val keys = scala.collection.mutable.Map.empty[String, Attribute]
    conj(onCond).foreach { c =>
      val (x, y) = c match {
        case EqualTo(a: Attribute, b: Attribute) => (a, b)
        case EqualNullSafe(a: Attribute, b: Attribute) => (a, b)
        case other => fail("journal MERGE ON supports only ns/ukey column " +
          s"equality conjuncts; got: ${other.sql}")
      }
      val (t, s) =
        if (tOut.contains(x) && sOut.contains(y)) (x, y)
        else if (tOut.contains(y) && sOut.contains(x)) (y, x)
        else fail("journal MERGE ON conjuncts must equate a target column " +
          s"with a source column; got: ${c.sql}")
      keys += t.name.toLowerCase -> s
    }
    if (keys.keySet != Set("ns", "ukey")) fail(
      "journal MERGE ON must equate exactly the target's (ns, ukey) with " +
        s"source columns; covered: ${keys.keySet.toSeq.sorted.mkString(", ")}")

    // ---- star expansion (resolution was skipped, so stars reach us raw):
    // target data column := source column of the same name, source-scoped
    val extras = table.dataColumnTypes.keySet -- EngineCols -- CanonicalCols
    def starAssigns(clause: String): Seq[Assignment] = {
      // star values are the SOURCE attributes themselves (already
      // resolved — a bare name would be ambiguous in UPDATE's two-sided
      // scope, and star semantics are source-by-name anyway). With
      // evolution, * maps EVERY source column (Delta's
      // star-with-autoMerge); without, the canonical record only.
      def srcCol(n: String): Attribute =
        sAttrs.find(_.name.equalsIgnoreCase(n)).getOrElse(fail(
          s"journal MERGE $clause *: source has no column '$n' to map"))
      if (evolve)
        sAttrs.map(a => Assignment(UnresolvedAttribute(Seq(a.name)), a))
      else {
        if (extras.nonEmpty) fail(s"journal MERGE $clause * on a store with " +
          s"evolved column(s) ${extras.toSeq.sorted.mkString(", ")} — list " +
          "the assignments explicitly, or use MERGE WITH SCHEMA EVOLUTION")
        CanonicalCols.map(n =>
          Assignment(UnresolvedAttribute(Seq(n)), srcCol(n)))
      }
    }

    // ---- clause routing, SQL first-match-wins over ARBITRARY clause
    // chains: clause i fires iff its own gate holds AND no earlier
    // clause in the same group was taken. Composite masks preserve
    // SQL's NULL-is-not-taken semantics (a NULL gate falls through to
    // the next clause, so "not taken" must be coalesce(cond, false) =
    // false, never three-valued NOT). An unconditional clause makes
    // everything after it dead code (masked() stops emitting).
    def norm(a: MergeAction): MergeAction = a match {
      case UpdateStarAction(c) => UpdateAction(c, starAssigns("UPDATE SET"))
      case InsertStarAction(c) => InsertAction(c, starAssigns("INSERT"))
      case other => other
    }
    def notTaken(c: Expression): Expression =
      org.apache.spark.sql.catalyst.expressions.Not(
        org.apache.spark.sql.catalyst.expressions.Coalesce(
          Seq(c, Literal(false))))
    def masked(actions: Seq[MergeAction], group: String)
        : Seq[(Option[Expression], MergeAction)] = {
      val out = Seq.newBuilder[(Option[Expression], MergeAction)]
      var prior: Seq[Expression] = Nil
      var live = true
      actions.foreach { a =>
        if (live) {
          val own = a match {
            case u: UpdateAction => u.condition
            case d: DeleteAction => d.condition
            case i: InsertAction => i.condition
            case other => fail(s"journal MERGE $group: unsupported " +
              s"action ${other.getClass.getSimpleName}")
          }
          out += (own.toSeq ++ prior.map(notTaken)).reduceOption(And) -> a
          own match {
            case Some(c) => prior :+= c
            case None => live = false
          }
        }
      }
      out.result()
    }
    val matchedClauses = masked(m.matchedActions.map(norm), "WHEN MATCHED")
    matchedClauses.foreach {
      case (_, _: UpdateAction) | (_, _: DeleteAction) => ()
      case (_, other) => fail("journal MERGE WHEN MATCHED supports UPDATE " +
        s"and DELETE; got ${other.getClass.getSimpleName}")
    }
    val updClauses: Seq[(Option[Expression], Seq[Assignment])] =
      matchedClauses.collect { case (g, u: UpdateAction) => g -> u.assignments }
    val delGates: Seq[Option[Expression]] =
      matchedClauses.collect { case (g, _: DeleteAction) => g }
    val insClauses: Seq[(Option[Expression], Seq[Assignment])] =
      masked(m.notMatchedActions.map(norm), "WHEN NOT MATCHED").map {
        case (g, i: InsertAction) => g -> i.assignments
        case (_, other) => fail("journal MERGE WHEN NOT MATCHED supports " +
          s"INSERT only; got ${other.getClass.getSimpleName}")
      }
    // ---- WHEN NOT MATCHED BY SOURCE — the full-reconciliation
    // clauses: target keys absent from the source DELETE (tombstone)
    // or UPDATE (rewrite through target-scope assignments, unassigned
    // columns riding current values). Same first-match-wins gate
    // algebra as the matched clauses.
    val bySrcClauses =
      masked(m.notMatchedBySourceActions, "WHEN NOT MATCHED BY SOURCE")
    bySrcClauses.foreach {
      case (_, _: UpdateAction) | (_, _: DeleteAction) => ()
      case (_, other) => fail("journal MERGE WHEN NOT MATCHED BY SOURCE " +
        s"supports UPDATE and DELETE; got ${other.getClass.getSimpleName}")
    }
    val bySrcUpdClauses: Seq[(Option[Expression], Seq[Assignment])] =
      bySrcClauses.collect { case (g, u: UpdateAction) => g -> u.assignments }
    val bySrcDelGates: Seq[Option[Expression]] =
      bySrcClauses.collect { case (g, _: DeleteAction) => g }

    // ---- assignments → the per-column source expressions.
    // UPDATE values resolve in the joined scope (SQL allows t refs —
    // though only key self-references survive validation); INSERT
    // values resolve against the source alone (SQL's insert scope).
    def dataExprs(as: Seq[Assignment], clause: String,
                  valueScope: Seq[Attribute])
        : (Map[String, Expression], Map[String, Expression]) = {
      val mm: Map[String, Expression] = as.map { a =>
        val k = a.key match {
          // a single-part name the target does not have: a NEW column —
          // legal only under WITH SCHEMA EVOLUTION
          case u: UnresolvedAttribute
              if u.nameParts.length == 1 &&
                !tAttrs.exists(_.name.equalsIgnoreCase(u.nameParts.head)) =>
            if (evolve) u.nameParts.head.toLowerCase
            else fail(s"journal MERGE: no target column " +
              s"'${u.nameParts.head}' — MERGE WITH SCHEMA EVOLUTION adds " +
              "new columns")
          case kk => resolve1(kk, tAttrs) match {
            case at: Attribute => at.name.toLowerCase
            case other => fail("journal MERGE can assign only top-level " +
              s"columns; got: ${other.sql}")
          }
        }
        if (SubqueryExpression.hasSubquery(a.value)) fail(
          s"journal MERGE does not support subqueries in assignments ($clause)")
        k -> resolve1(a.value, valueScope)
      }.toMap
      mm.foreach { case (n, v) =>
        if (EngineCols.contains(n)) v match {
          case a: Attribute if tOut.contains(a) => () // aligned keep-current
          case Literal(null, _) => ()
          case _ => fail(s"journal MERGE cannot assign engine column '$n' " +
            s"($clause) — seq/epoch are assigned by the store")
        }
      }
      Seq("ns", "ukey").foreach { n =>
        mm.get(n).foreach {
          case a: Attribute if a.semanticEquals(keys(n)) => ()
          case a: Attribute if tOut.contains(a) && a.name.equalsIgnoreCase(n) => ()
          case other => fail(s"journal MERGE cannot reassign join key '$n' " +
            s"(got ${other.sql} in $clause)")
        }
      }
      val extraKeys = mm.keySet -- EngineCols -- Set("ns", "ukey") -- DataCols
      if (extraKeys.nonEmpty && !evolve) fail("journal MERGE reconciles " +
        s"the canonical (ns, ukey, ts, payload, val) record; evolved " +
        s"column(s) ${extraKeys.toSeq.sorted.mkString(", ")} cannot be " +
        "merge-assigned — use MERGE WITH SCHEMA EVOLUTION (or append " +
        "them through the Scala API / INSERT INTO)")
      def srcOnly(n: String, v: Expression): Unit =
        if (!v.references.subsetOf(sOut)) fail(s"journal MERGE $clause " +
          s"assignment to '$n' may reference source columns only; got: ${v.sql}")
      val dataMap = DataCols.map { n =>
        val v = mm.getOrElse(n, fail(s"journal MERGE $clause must assign " +
          s"'$n': the appended row carries whole-record semantics " +
          "(ns, ukey, ts, payload, val) — a column left unassigned has no " +
          "value to ride it"))
        srcOnly(n, v)
        n -> v
      }.toMap
      val extraMap = extraKeys.toSeq.sorted.map { n =>
        val v = mm(n); srcOnly(n, v); n -> v
      }.toMap
      (dataMap, extraMap)
    }
    val updMaps = updClauses.map(c => dataExprs(c._2, "UPDATE", both))
    val insMaps = insClauses.map(c => dataExprs(c._2, "INSERT", sAttrs))
    // every UPDATE/INSERT clause must evolve the SAME column set — the
    // appended merge delta has exactly one schema
    val evolveSets = (updMaps.map(_._2.keySet) ++ insMaps.map(_._2.keySet))
      .distinct
    if (evolveSets.size > 1) fail("journal MERGE WITH SCHEMA EVOLUTION: " +
      "every UPDATE and INSERT clause must evolve the SAME column set (" +
      evolveSets.map(_.toSeq.sorted.mkString("{", ", ", "}"))
        .mkString(" vs ") + ") — the merge delta has one schema")
    // shared-carrier shape (the historical single-clause plan): ONE
    // update clause whose values match the single insert clause's (or
    // with no insert clause at all) rides the canonical s.* carriers;
    // any other update shape projects per-clause __mc_u<i>_ carriers
    // the routing join selects by masked gate.
    def sameValues(a: (Map[String, Expression], Map[String, Expression]),
                   b: (Map[String, Expression], Map[String, Expression]))
        : Boolean =
      DataCols.forall(n => a._1(n).semanticEquals(b._1(n))) &&
        a._2.keySet == b._2.keySet &&
        a._2.forall { case (n, v) => v.semanticEquals(b._2(n)) }
    val sharedCarrier = updMaps.isEmpty ||
      (updMaps.size == 1 && (insMaps.isEmpty ||
        (insMaps.size == 1 && sameValues(updMaps.head, insMaps.head))))
    // insert-route canonical values: a single clause rides its own
    // values (the historical plan); N clauses compose a PROJECTION-TIME
    // CASE over the masked source-scope gates (ELSE = first clause's
    // values, so non-insert routes — the delete tombstone's ts — stay
    // deterministic)
    val insProj: Option[(Map[String, Expression], Map[String, Expression])] =
      insMaps match {
        case Seq() => None
        case Seq(one) => Some(one)
        case many =>
          val gates = insClauses.map(_._1.map(resolve1(_, sAttrs)))
          def pick(vals: Seq[Map[String, Expression]], n: String): Expression =
            CaseWhen(gates.zip(vals).collect {
              case (Some(g), mm) => (g, mm(n)) },
              Some(vals.head(n)))
          Some((DataCols.map(n => n -> pick(many.map(_._1), n)).toMap,
            many.head._2.keySet.toSeq.sorted
              .map(n => n -> pick(many.map(_._2), n)).toMap))
      }
    // delete-only merge: carry the source's own ts/payload/val (the
    // tombstone needs a ts to ride the appended row). A merge whose ONLY
    // action is WHEN NOT MATCHED BY SOURCE keeps no source row at all —
    // its projection is typed nulls (the join key columns still come
    // from the ON equalities).
    val primary: Option[(Map[String, Expression], Map[String, Expression])] =
      if (sharedCarrier) updMaps.headOption.orElse(insProj)
      else insProj.orElse(updMaps.headOption)
    val proj: Map[String, Expression] =
      primary.map(_._1).getOrElse {
        if (delGates.isEmpty &&
            (bySrcDelGates.nonEmpty || bySrcUpdClauses.nonEmpty)) {
          val types = table.dataColumnTypes
          DataCols.map(n => n -> (Literal(null, types(n)): Expression)).toMap
        } else DataCols.map { n =>
          n -> sAttrs.find(_.name.equalsIgnoreCase(n))
            .getOrElse(fail(s"a delete-only journal MERGE needs source " +
              s"column '$n' to shape the tombstone row"))
        }.toMap
      }
    // evolved assignments (WITH SCHEMA EVOLUTION): ride the projected
    // source as extra columns — the store's merge treats them as the
    // schema-evolving delta (no-op decision included)
    val extraProj: Seq[(String, Expression)] =
      primary.map(_._2).getOrElse(Map.empty).toSeq.sortBy(_._1)

    // ---- clause conditions: evaluated inside the store's routing join,
    // where the source rides under alias "s" with the canonical columns
    // and current state under alias "t" as (ns, ukey, cur_payload) —
    // rewrite source references to the canonical column carrying them,
    // and (where the clause can see the target) target references to
    // the state columns the join reconstructs.
    val carriers: Map[String, Expression] =
      proj ++ extraProj ++
        Map[String, Expression]("ns" -> keys("ns"), "ukey" -> keys("ukey"))
    // source refs a gate needs beyond the projected record columns ride
    // dedicated __mc_s<k> carriers (auto-added to the projection), so
    // any source-scope gate expression is routable
    val autoCarriers =
      scala.collection.mutable.LinkedHashMap.empty[Attribute, String]
    // a gate reading target ts/val widens state reconstruction to the
    // full record (checkpoints don't carry ts/val — the late-arrival
    // guard's structural cost, same as by-source UPDATE's)
    var needFullState = false
    def routedCond(c0: Expression, clause: String,
                   allowSource: Boolean, allowTarget: Boolean): Expression = {
      val c = resolve1(c0, both)
      if (SubqueryExpression.hasSubquery(c)) fail(
        s"journal MERGE does not support subqueries in the $clause condition")
      c.transform {
        case a: Attribute if sOut.contains(a) =>
          if (!allowSource) fail(s"journal MERGE $clause condition may " +
            s"reference target columns only; got: ${a.name}")
          val carrier = carriers.collectFirst {
            case (n, e) if e.semanticEquals(a) => n
          }.orElse(autoCarriers.collectFirst {
            case (at, n) if at.semanticEquals(a) => n
          }).getOrElse {
            val n = s"__mc_s${autoCarriers.size}"
            autoCarriers += a -> n
            n
          }
          UnresolvedAttribute(Seq("s", carrier))
        case a: Attribute if tOut.contains(a) =>
          if (!allowTarget) fail(s"journal MERGE $clause condition may " +
            s"reference source columns only (current state is not " +
            s"visible to this routing predicate); got: ${a.name}")
          a.name.toLowerCase match {
            case "ns"      => UnresolvedAttribute(Seq("t", "ns"))
            case "ukey"    => UnresolvedAttribute(Seq("t", "ukey"))
            case "payload" => UnresolvedAttribute(Seq("cur_payload"))
            case "ts"  => needFullState = true
              UnresolvedAttribute(Seq("cur_ts"))
            case "val" => needFullState = true
              UnresolvedAttribute(Seq("cur_val"))
            // an evolving merge reconstructs current values for its
            // evolved columns (the cur__ carriers) — visible to gates
            case n if extraProj.exists(_._1 == n) =>
              UnresolvedAttribute(Seq(s"cur__$n"))
            case n => fail(s"journal MERGE $clause condition can see " +
              s"target columns ns, ukey, ts, payload, val only (the " +
              s"state side of the routing join carries no '$n')")
          }
      }
    }
    // target refs allowed in matched gates: composite first-match masks
    // legitimately embed earlier clauses' target references
    val delForStore: Option[Expression] =
      if (delGates.isEmpty) None
      else Some(delGates.map(_.map(routedCond(_, "DELETE",
        allowSource = true, allowTarget = true)).getOrElse(Literal(true)))
        .reduce(Or))
    // matched UPDATE: the union gate routes keep/no-op; on the carrier
    // path each clause's masked gate selects its own __mc_u<i>_ columns
    val updCases: Seq[(Expression, String)] =
      if (sharedCarrier) Nil
      else updClauses.zipWithIndex.map { case ((g, _), i) =>
        g.map(routedCond(_, "UPDATE", allowSource = true,
          allowTarget = true)).getOrElse(Literal(true)) -> s"__mc_u${i}_"
      }
    val updValueCarriers: Seq[(String, Expression)] =
      if (sharedCarrier) Nil
      else updMaps.zipWithIndex.flatMap { case ((d, e), i) =>
        (DataCols.map(n => n -> d(n)) ++ e.toSeq.sortBy(_._1)).map {
          case (n, v) => s"__mc_u${i}_$n" ->
            table.dataColumnTypes.get(n)
              .map(dt => Cast(v, dt): Expression).getOrElse(v)
        }
      }
    val updForStore: Option[Expression] =
      if (updClauses.isEmpty) None
      else if (sharedCarrier)
        updClauses.head._1.map(routedCond(_, "UPDATE",
          allowSource = true, allowTarget = true))
      else Some(updCases.map(_._1).reduce(Or))
    val bySrcForStore: Option[Expression] =
      if (bySrcDelGates.isEmpty) None
      else Some(bySrcDelGates.map(_.map(routedCond(_,
        "NOT MATCHED BY SOURCE", allowSource = false, allowTarget = true))
        .getOrElse(Literal(true))).reduce(Or))
    // by-source UPDATE: assignments are TARGET-scope expressions over
    // the reconstructed full record; assignable columns are the data
    // record itself (plus columns this merge's own evolution carries) —
    // anything else would silently drop out of the routed projection.
    // N clauses compose per-column CASEs over the masked gates,
    // unassigned columns riding current values per firing clause.
    def bySrcAssigns(assigns: Seq[Assignment]): Seq[(String, Expression)] =
      assigns.map { a =>
        val k = resolve1(a.key, tAttrs) match {
          case at: Attribute => at.name.toLowerCase
          case other => fail("journal MERGE can assign only top-level " +
            s"columns; got: ${other.sql}")
        }
        if (EngineCols.contains(k)) fail("journal MERGE cannot assign " +
          s"engine column '$k' (NOT MATCHED BY SOURCE UPDATE)")
        if (k == "ns" || k == "ukey") fail("journal MERGE cannot " +
          s"reassign join key '$k' (NOT MATCHED BY SOURCE UPDATE); " +
          "DELETE + INSERT expresses a key move")
        if (!DataCols.contains(k) && !extraProj.exists(_._1 == k)) fail(
          "journal MERGE NOT MATCHED BY SOURCE UPDATE can assign " +
            "ts/payload/val (and columns this merge itself evolves); " +
            s"got '$k'")
        if (SubqueryExpression.hasSubquery(a.value)) fail(
          "journal MERGE does not support subqueries in assignments " +
            "(NOT MATCHED BY SOURCE UPDATE)")
        k -> routedCond(a.value, "NOT MATCHED BY SOURCE UPDATE",
          allowSource = false, allowTarget = true)
      }
    def curRef(n: String): Expression = n match {
      case "ts"      => UnresolvedAttribute(Seq("cur_ts"))
      case "val"     => UnresolvedAttribute(Seq("cur_val"))
      case "payload" => UnresolvedAttribute(Seq("cur_payload"))
      case other     => UnresolvedAttribute(Seq(s"cur__$other"))
    }
    val (bySrcSetForStore, bySrcUpdCondForStore)
        : (Seq[(String, Expression)], Option[Expression]) =
      bySrcUpdClauses.map { case (g, as) =>
        g.map(routedCond(_, "NOT MATCHED BY SOURCE", allowSource = false,
          allowTarget = true)) -> bySrcAssigns(as)
      } match {
        case Seq() => (Nil, None)
        case Seq((g, set)) => (set, g)
        case cls =>
          val cols = cls.flatMap(_._2.map(_._1)).distinct
          val set = cols.map { n =>
            n -> (CaseWhen(cls.map { case (g, as) =>
              (g.getOrElse(Literal(true)),
                as.collectFirst { case (`n`, v) => v }.getOrElse(curRef(n)))
            }, Some(curRef(n))): Expression)
          }
          (set, Some(cls.map(_._1.getOrElse(Literal(true))).reduce(Or)))
      }
    // INSERT gate: the clause's SQL scope is the source only (there is
    // no target row on the not-matched route)
    val insForStore: Option[Expression] = {
      val gs = insClauses.map(_._1)
      if (gs.isEmpty || gs.forall(_.isEmpty)) None
      else Some(gs.map(_.map(routedCond(_, "INSERT", allowSource = true,
        allowTarget = false)).getOrElse(Literal(true))).reduce(Or))
    }
    JournalMergeCommand(table, m.sourceTable,
      Seq("ns" -> keys("ns"), "ukey" -> keys("ukey")) ++
        DataCols.map(n => n -> proj(n)) ++ extraProj ++
        updValueCarriers ++
        autoCarriers.toSeq.map { case (a, n) => n -> (a: Expression) },
      delForStore.map(ExprBox), matchedUpdate = updMaps.nonEmpty,
      notMatchedInsert = insMaps.nonEmpty,
      updateCond = updForStore.map(ExprBox),
      bySourceDelete = bySrcForStore.map(ExprBox),
      insertCond = insForStore.map(ExprBox),
      bySourceSet = bySrcSetForStore.map { case (n, e) => n -> ExprBox(e) },
      bySourceSetCond = bySrcUpdCondForStore.map(ExprBox),
      updateValues = updCases.map { case (g, p) => ExprBox(g) -> p },
      stateNeedsTsVal = needFullState)
  }

  /** SQL UPDATE: rewrite the CURRENT state rows matching the condition
    * through the assignments and append them (standard affected-count
    * semantics; history preserved — see JournalTable.runUpdate for why
    * this is an append, not a merge). Assignments and the condition may
    * reference any target column — they evaluate over the live state
    * frame. */
  def translateUpdate(u: UpdateTable, table: JournalTable): LogicalPlan = {
    val tOut = u.table.outputSet
    u.condition.foreach { c =>
      require(!SubqueryExpression.hasSubquery(c),
        "UPDATE on a journal table does not support subqueries in the " +
          "condition; materialize the subquery into a literal list first")
    }
    val byName = u.assignments.map { a =>
      val n = a.key match {
        case at: Attribute => at.name.toLowerCase
        case other => fail("journal UPDATE can assign only top-level " +
          s"columns; got: ${other.sql}")
      }
      if (SubqueryExpression.hasSubquery(a.value)) fail(
        "journal UPDATE does not support subqueries in assignments")
      n -> a.value
    }.toMap
    (EngineCols ++ Set("ns", "ukey")).foreach { n =>
      byName.get(n).foreach {
        case a: Attribute if tOut.contains(a) && a.name.equalsIgnoreCase(n) =>
          () // aligned keep-current self-reference
        case other =>
          if (EngineCols.contains(n)) fail(
            s"journal UPDATE cannot assign engine column '$n'")
          else fail(s"journal UPDATE cannot reassign key column '$n' " +
            s"(got ${other.sql}); DELETE + INSERT expresses a key move")
      }
    }
    JournalUpdateCommand(table,
      byName.filterNot { case (n, _) => EngineCols.contains(n) }.toSeq,
      u.condition)
  }
}

private[sources] object JournalMergeSupport {
  val EngineCols = Set("seq", "epoch", "skey")
  val DataCols = Seq("ts", "payload", "val")
  val CanonicalCols = Seq("ns", "ukey", "ts", "payload", "val")

  def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(msg)

  def conj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conj(l) ++ conj(r)
    case x => Seq(x)
  }
}

/** Opaque expression holder: the command's routing/assignment
  * expressions deliberately carry `s.<col>` references that resolve
  * INSIDE the store's merge join, and the UPDATE branch carries
  * target-name references that resolve against the state frame —
  * CheckAnalysis must not walk them as the command's own (they would
  * fail its resolved-ness sweep). A non-Expression product field is
  * invisible to QueryPlan.expressions. */
private[sources] case class ExprBox(e: Expression)

/** Runs the merge on the driver (the store launches its own jobs);
  * returns the number of reconciliation rows appended (0 = the merge
  * was a complete no-op). */
case class JournalMergeCommand(
    @transient table: JournalTable,
    @transient source: LogicalPlan,
    @transient cols: Seq[(String, Expression)],
    @transient deleteCond: Option[ExprBox],
    matchedUpdate: Boolean,
    notMatchedInsert: Boolean,
    @transient updateCond: Option[ExprBox] = None,
    @transient bySourceDelete: Option[ExprBox] = None,
    @transient insertCond: Option[ExprBox] = None,
    @transient bySourceSet: Seq[(String, ExprBox)] = Nil,
    @transient bySourceSetCond: Option[ExprBox] = None,
    @transient updateValues: Seq[(ExprBox, String)] = Nil,
    stateNeedsTsVal: Boolean = false)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("appended_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val srcDf = StreamBatchBridge.ofRows(spark, source)
    val types = table.dataColumnTypes
    val projected = srcDf.select(cols.map { case (n, e) =>
      val c = StreamBatchBridge.columnOf(e)
      types.get(n).fold(c)(c.cast).as(n)
    }: _*)
    Seq(Row(table.runMerge(projected,
      deleteCond.map(b => StreamBatchBridge.columnOf(b.e)),
      matchedUpdate, notMatchedInsert,
      updateCond.map(b => StreamBatchBridge.columnOf(b.e)),
      bySourceDelete.map(b => StreamBatchBridge.columnOf(b.e)),
      insertCond.map(b => StreamBatchBridge.columnOf(b.e)),
      bySourceSet.map { case (n, b) => n -> StreamBatchBridge.columnOf(b.e) },
      bySourceSetCond.map(b => StreamBatchBridge.columnOf(b.e)),
      updateValues.map { case (b, p) =>
        StreamBatchBridge.columnOf(b.e) -> p },
      stateNeedsTsVal)))
  }
}

/** Runs the UPDATE on the driver; returns the matched-row count. */
case class JournalUpdateCommand(
    @transient table: JournalTable,
    @transient assigns: Seq[(String, Expression)],
    @transient cond: Option[Expression])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] =
    Seq(AttributeReference("updated_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(table.runUpdate(assigns, cond)))
}
