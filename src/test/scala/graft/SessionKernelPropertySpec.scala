package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream
import graft.streaming.EventStream.{OpenSession, SessionOut}

/** Generator-driven properties of the SHARED session merge/close
  * kernel (`EventStream.mergeAndClose`) — the one piece of logic both
  * sessionizers (flatMapGroupsWithState and transformWithState) rest
  * on. The simulation mirrors Spark's semantics outside the engine:
  * events arrive in arbitrary batch splits and arrival orders, the
  * watermark is the running max of (batch-max-event-ms − delay),
  * rows behind the watermark at their batch are dropped (the
  * stateful operator's late filter), and a final zero-row invocation
  * models the end-of-stream timer fire. Against that, for EVERY
  * random stream the emitted set must equal the batch
  * gaps-and-islands sessions over the surviving events restricted to
  * watermark-closed horizons — i.e. incremental processing can never
  * split, merge, double-emit, or drop a session relative to the
  * batch answer, under any batching of the input. */
class SessionKernelPropertySpec extends AnyFunSuite {

  private val gapUs = 30L * 60L * 1000000L
  private val delayMs = EventStream.SessionDelayMs

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1042L + i)))

  // event times over a ~3-day span at second-ish granularity so gaps
  // both above and below 30 min are common; duplicates allowed
  private val eventsGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.choose(0L, 3L * 24 * 3600) map (_ * 1000000L))

  // arbitrary batch assignment: each event gets a batch index; batch
  // CONTENTS are arbitrary (out-of-order arrival), batches replay in
  // index order
  private case class Stream(batches: List[List[Long]])
  private val streamGen: Gen[Stream] = for {
    evs <- eventsGen
    k <- Gen.choose(1, 5)
    tags <- Gen.listOfN(evs.size, Gen.choose(0, k - 1))
  } yield Stream((0 until k).toList.map(b =>
    evs.zip(tags).filter(_._2 == b).map(_._1)))

  /** Reference answer: plain gaps-and-islands over `survivors`,
    * split by whether the final watermark passed each horizon. */
  private def batchSessions(survivors: Seq[Long], finalWm: Long)
      : (Set[(Long, Long, Long)], Set[(Long, Long, Long)]) = {
    val merged = survivors.sorted.foldLeft(List.empty[OpenSession]) {
      (acc, t) => acc match {
        case h :: rest if t <= h.last_us + gapUs =>
          OpenSession(h.start_us, math.max(h.last_us, t), h.n + 1) :: rest
        case _ => OpenSession(t, t, 1) :: acc
      }
    }
    val (closed, open) =
      merged.partition(EventStream.horizonMs(_, gapUs) < finalWm)
    (closed.map(s => (s.start_us, s.last_us, s.n)).toSet,
      open.map(s => (s.start_us, s.last_us, s.n)).toSet)
  }

  test("property: incremental merge/close equals batch sessions under any batching") {
    for (st <- samples(streamGen, 60)) {
      var wm = 0L
      var open = Seq.empty[OpenSession]
      var emitted = List.empty[OpenSession]
      var survivors = List.empty[Long]
      for (batch <- st.batches) {
        // Spark's stateful late filter: rows behind the CURRENT
        // watermark never reach the operator
        val live = batch.filter(t => t / 1000L >= wm)
        survivors ++= live
        val (closed, stillOpen) = EventStream.mergeAndClose(
          live.map(t => OpenSession(t, t, 1)), open, wm, gapUs)
        emitted ++= closed
        open = stillOpen
        if (live.nonEmpty)
          wm = math.max(wm, live.max / 1000L - delayMs)
      }
      // end-of-stream timer fire: zero new rows at the final watermark
      val (lastClosed, lastOpen) =
        EventStream.mergeAndClose(Seq.empty, open, wm, gapUs)
      emitted ++= lastClosed
      open = lastOpen

      val got = emitted.map(s => (s.start_us, s.last_us, s.n)).toSet
      val gotOpen = open.map(s => (s.start_us, s.last_us, s.n)).toSet
      val (expClosed, expOpen) = batchSessions(survivors, wm)
      assert(got == expClosed, s"closed mismatch for $st")
      assert(gotOpen == expOpen, s"open mismatch for $st")
      // no session lost or double-counted: every surviving event is in
      // exactly one emitted-or-open session
      assert(emitted.map(_.n).sum + open.map(_.n).sum == survivors.size)
      assert(emitted.size == emitted.distinct.size)
    }
  }

  test("property: emission is monotone — a closed session never reopens") {
    for (st <- samples(streamGen, 40)) {
      var wm = 0L
      var open = Seq.empty[OpenSession]
      var emitted = Set.empty[(Long, Long, Long)]
      for (batch <- st.batches) {
        val live = batch.filter(t => t / 1000L >= wm)
        val (closed, stillOpen) = EventStream.mergeAndClose(
          live.map(t => OpenSession(t, t, 1)), open, wm, gapUs)
        // nothing still open may overlap a session already emitted —
        // an in-watermark event can never extend a closed session
        for (o <- stillOpen; (s, e, _) <- emitted)
          assert(o.start_us > e + gapUs || o.last_us + gapUs < s,
            s"open $o overlaps closed ($s,$e) for $st")
        emitted ++= closed.map(s => (s.start_us, s.last_us, s.n))
        open = stillOpen
        if (live.nonEmpty)
          wm = math.max(wm, live.max / 1000L - delayMs)
      }
    }
  }
}
