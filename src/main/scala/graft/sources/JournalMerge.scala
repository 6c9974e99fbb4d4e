package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualNullSafe, EqualTo, Expression, Literal, SubqueryExpression}
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
  *     source columns carried into the merge source, and the target's
  *     ns/ukey/payload (the state columns the routing join carries).
  *   - `WHEN MATCHED [AND cond] THEN UPDATE SET … / SET *` — the gate
  *     shares DELETE's scope; assignments take ts/payload/val from
  *     source-only expressions (whole-record semantics: the appended
  *     update row IS the record).
  *   - `WHEN NOT MATCHED [AND cond] THEN INSERT … / INSERT *` — the
  *     gate sees the source only (no target row exists on this route);
  *     same assignment columns; with both UPDATE and INSERT present
  *     their value expressions must agree (one source row serves both
  *     routes).
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

    // ---- WHEN MATCHED routing, SQL first-match-wins. Conditions are
    // supported on both matched clauses; composite gates preserve SQL's
    // NULL-is-not-taken semantics (a NULL gate falls through to the
    // next clause, so "not taken" must be coalesce(cond, false) = false,
    // never three-valued NOT).
    def norm(a: MergeAction): MergeAction = a match {
      case UpdateStarAction(c) => UpdateAction(c, starAssigns("UPDATE SET"))
      case InsertStarAction(c) => InsertAction(c, starAssigns("INSERT"))
      case other => other
    }
    def notTaken(c: Expression): Expression =
      org.apache.spark.sql.catalyst.expressions.Not(
        org.apache.spark.sql.catalyst.expressions.Coalesce(
          Seq(c, Literal(false))))
    var delCond: Option[Option[Expression]] = None
    var updAssigns: Option[Seq[Assignment]] = None
    var updCond: Option[Expression] = None
    m.matchedActions.map(norm) match {
      case Seq() => ()
      case Seq(u: UpdateAction) =>
        updAssigns = Some(u.assignments); updCond = u.condition
      case Seq(d: DeleteAction) => delCond = Some(d.condition)
      case Seq(d: DeleteAction, u: UpdateAction) =>
        if (d.condition.isEmpty) delCond = Some(None) // UPDATE is dead code
        else {
          delCond = Some(d.condition)
          updAssigns = Some(u.assignments); updCond = u.condition
        }
      case Seq(u: UpdateAction, d: DeleteAction) =>
        updAssigns = Some(u.assignments); updCond = u.condition
        u.condition.foreach { uc =>
          // first-match-wins: DELETE fires only where the UPDATE gate
          // was not taken
          delCond = Some(Some(d.condition
            .map(dc => And(notTaken(uc), dc)).getOrElse(notTaken(uc))))
        } // unconditional UPDATE shadows DELETE entirely
      case _ => fail("journal MERGE supports at most one WHEN MATCHED " +
        "DELETE and one WHEN MATCHED UPDATE clause")
    }
    var insCond: Option[Expression] = None
    val insAssigns = m.notMatchedActions.map(norm) match {
      case Seq() => None
      case Seq(i: InsertAction) =>
        insCond = i.condition // gate evaluated over the source row
        Some(i.assignments)
      case _ => fail("journal MERGE supports at most one WHEN NOT MATCHED clause")
    }
    // ---- WHEN NOT MATCHED BY SOURCE — the full-reconciliation
    // clauses: target keys absent from the source DELETE (tombstone)
    // or UPDATE (rewrite through target-scope assignments, unassigned
    // columns riding current values). Same first-match-wins gate
    // algebra as the matched clauses.
    var bySourceDel: Option[Option[Expression]] = None
    var bySrcUpdAssigns: Option[Seq[Assignment]] = None
    var bySrcUpdCond: Option[Expression] = None
    m.notMatchedBySourceActions match {
      case Seq() => ()
      case Seq(d: DeleteAction) => bySourceDel = Some(d.condition)
      case Seq(u: UpdateAction) =>
        bySrcUpdAssigns = Some(u.assignments); bySrcUpdCond = u.condition
      case Seq(d: DeleteAction, u: UpdateAction) =>
        if (d.condition.isEmpty) bySourceDel = Some(None) // UPDATE dead
        else {
          bySourceDel = Some(d.condition)
          bySrcUpdAssigns = Some(u.assignments); bySrcUpdCond = u.condition
        }
      case Seq(u: UpdateAction, d: DeleteAction) =>
        bySrcUpdAssigns = Some(u.assignments); bySrcUpdCond = u.condition
        u.condition.foreach { uc =>
          bySourceDel = Some(Some(d.condition
            .map(dc => And(notTaken(uc), dc)).getOrElse(notTaken(uc))))
        } // unconditional UPDATE shadows DELETE entirely
      case other => fail("journal MERGE supports at most one WHEN NOT " +
        "MATCHED BY SOURCE DELETE and one UPDATE clause (got " +
        other.map(_.getClass.getSimpleName).mkString(", ") + ")")
    }

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
    val updMap = updAssigns.map(dataExprs(_, "UPDATE", both))
    val insMap = insAssigns.map(dataExprs(_, "INSERT", sAttrs))
    (updMap, insMap) match {
      case (Some((u, ue)), Some((i, ie))) =>
        DataCols.foreach { n =>
          if (!u(n).semanticEquals(i(n))) fail("journal MERGE: UPDATE and " +
            s"INSERT assign different expressions to '$n' — one source row " +
            "serves both routes; align the clauses")
        }
        if (ue.keySet != ie.keySet) fail("journal MERGE WITH SCHEMA " +
          "EVOLUTION: UPDATE and INSERT must evolve the SAME column set " +
          s"(UPDATE: ${ue.keySet.toSeq.sorted.mkString(", ")}; INSERT: " +
          s"${ie.keySet.toSeq.sorted.mkString(", ")}) — one source row " +
          "serves both routes")
        ue.foreach { case (n, v) =>
          if (!v.semanticEquals(ie(n))) fail("journal MERGE: UPDATE and " +
            s"INSERT assign different expressions to '$n' — one source " +
            "row serves both routes; align the clauses")
        }
      case _ => ()
    }
    // delete-only merge: carry the source's own ts/payload/val (the
    // tombstone needs a ts to ride the appended row). A merge whose ONLY
    // action is WHEN NOT MATCHED BY SOURCE keeps no source row at all —
    // its projection is typed nulls (the join key columns still come
    // from the ON equalities).
    val proj: Map[String, Expression] =
      updMap.map(_._1).orElse(insMap.map(_._1)).getOrElse {
        if (delCond.isEmpty &&
            (bySourceDel.isDefined || bySrcUpdAssigns.isDefined)) {
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
      updMap.map(_._2).orElse(insMap.map(_._2)).getOrElse(Map.empty)
        .toSeq.sortBy(_._1)

    // ---- clause conditions: evaluated inside the store's routing join,
    // where the source rides under alias "s" with the canonical columns
    // and current state under alias "t" as (ns, ukey, cur_payload) —
    // rewrite source references to the canonical column carrying them,
    // and (where the clause can see the target) target references to
    // the state columns the join reconstructs.
    val carriers: Map[String, Expression] =
      proj ++ extraProj ++
        Map[String, Expression]("ns" -> keys("ns"), "ukey" -> keys("ukey"))
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
          }.getOrElse(fail(s"journal MERGE $clause condition references " +
            s"'${a.name}', which is not carried into the merge source " +
            "(carried: ns, ukey, ts, payload, val)"))
          UnresolvedAttribute(Seq("s", carrier))
        case a: Attribute if tOut.contains(a) =>
          if (!allowTarget) fail(s"journal MERGE $clause condition may " +
            s"reference source columns only (current state is not " +
            s"visible to this routing predicate); got: ${a.name}")
          a.name.toLowerCase match {
            case "ns"      => UnresolvedAttribute(Seq("t", "ns"))
            case "ukey"    => UnresolvedAttribute(Seq("t", "ukey"))
            case "payload" => UnresolvedAttribute(Seq("cur_payload"))
            // a by-source UPDATE widens state reconstruction to the
            // full record, so ts/val current values become visible
            case "ts" if bySrcUpdAssigns.isDefined =>
              UnresolvedAttribute(Seq("cur_ts"))
            case "val" if bySrcUpdAssigns.isDefined =>
              UnresolvedAttribute(Seq("cur_val"))
            // an evolving merge reconstructs current values for its
            // evolved columns (the cur__ carriers) — visible to gates
            case n if extraProj.exists(_._1 == n) =>
              UnresolvedAttribute(Seq(s"cur__$n"))
            case n => fail(s"journal MERGE $clause condition can see " +
              s"target columns ns, ukey, payload only (the state side of " +
              s"the routing join carries no '$n')")
          }
      }
    }
    val delForStore: Option[Expression] = delCond.map {
      case None => Literal(true)
      // target refs allowed: composite first-match gates (¬updCond ∧ …)
      // legitimately embed the UPDATE condition's target references
      case Some(c0) => routedCond(c0, "DELETE",
        allowSource = true, allowTarget = true)
    }
    val updForStore: Option[Expression] = updCond.map(
      routedCond(_, "UPDATE", allowSource = true, allowTarget = true))
    val bySrcForStore: Option[Expression] = bySourceDel.map {
      case None => Literal(true)
      case Some(c0) => routedCond(c0, "NOT MATCHED BY SOURCE",
        allowSource = false, allowTarget = true)
    }
    // by-source UPDATE: assignments are TARGET-scope expressions over
    // the reconstructed full record; assignable columns are the data
    // record itself (plus columns this merge's own evolution carries) —
    // anything else would silently drop out of the routed projection
    val bySrcSetForStore: Seq[(String, Expression)] =
      bySrcUpdAssigns.map(_.map { a =>
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
      }).getOrElse(Nil)
    val bySrcUpdCondForStore: Option[Expression] = bySrcUpdCond.map(
      routedCond(_, "NOT MATCHED BY SOURCE", allowSource = false,
        allowTarget = true))
    // INSERT gate: the clause's SQL scope is the source only (there is
    // no target row on the not-matched route)
    val insForStore: Option[Expression] = insCond.map(
      routedCond(_, "INSERT", allowSource = true, allowTarget = false))
    JournalMergeCommand(table, m.sourceTable,
      Seq("ns" -> keys("ns"), "ukey" -> keys("ukey")) ++
        DataCols.map(n => n -> proj(n)) ++ extraProj,
      delForStore.map(ExprBox), matchedUpdate = updMap.isDefined,
      notMatchedInsert = insMap.isDefined,
      updateCond = updForStore.map(ExprBox),
      bySourceDelete = bySrcForStore.map(ExprBox),
      insertCond = insForStore.map(ExprBox),
      bySourceSet = bySrcSetForStore.map { case (n, e) => n -> ExprBox(e) },
      bySourceSetCond = bySrcUpdCondForStore.map(ExprBox))
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
    @transient bySourceSetCond: Option[ExprBox] = None)
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
      bySourceSetCond.map(b => StreamBatchBridge.columnOf(b.e)))))
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
