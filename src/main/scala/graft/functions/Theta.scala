package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

/** Theta-sketch distinct-set algebra — the mergeable-state machinery
  * HLL cannot provide: theta sketches support INTERSECTION and
  * DIFFERENCE estimates, so "how many distinct users appear in both
  * segments" / "how many are new this month" run on pre-aggregated
  * per-segment state instead of a distinct-join over raw history.
  *
  * Unlike HLL (whose direct sketches carry a HIP estimator that
  * unions cannot preserve — see Profile.distinctSketch), a theta
  * sketch in exact mode is purely the retained item hashes: below
  * the union gadget's purge threshold (~2k entries at the default
  * k = 4096), direct, unioned and re-partitioned sketches agree
  * EXACTLY (spec-asserted at 6k distinct/group). Deep in estimation
  * mode, intermediate purges make θ — and thus the exact retained
  * set — mildly merge-order dependent: estimates stay within the
  * published error bounds under any partitioning, but bit-equality
  * assertions must not cross the purge threshold (the
  * q_theta_segments gate therefore asserts TOLERANCE booleans, not
  * estimate equality, at sf0.1's ~15k-distinct segments).
  *
  * The aggregation is a typed [[Aggregator]] (ObjectHashAggregate
  * keeps the live Union object per group in memory; Java
  * serialization — compact sketch bytes — only on spill/shuffle of
  * partial states). The set-op helpers are scalar UDFs deliberately:
  * they run on the handful of POST-aggregation rows (one per
  * group/segment), never on the corpus scan, so codegen is
  * irrelevant there and the Datasketches library calls need a JVM
  * seam anyway.
  */
object Theta {

  /** Serializable union buffer: live `Union` in memory, compact
    * sketch bytes on the wire.
    */
  final class ThetaBuf extends Serializable {
    @transient private var union: Union = SetOperation.builder().buildUnion()
    def add(v: Long): ThetaBuf = { union.update(v); this }
    def mergeIn(o: ThetaBuf): ThetaBuf = { union.union(o.compact); this }
    def compact: CompactSketch = union.getResult
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val b = compact.toByteArray
      out.writeInt(b.length); out.write(b)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      union = SetOperation.builder().buildUnion()
      union.union(Memory.wrap(b))
    }
  }

  private class SketchAgg extends Aggregator[Long, ThetaBuf, Array[Byte]] {
    def zero: ThetaBuf = new ThetaBuf
    def reduce(b: ThetaBuf, v: Long): ThetaBuf = b.add(v)
    def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = a.mergeIn(b)
    def finish(b: ThetaBuf): Array[Byte] = b.compact.toByteArray
    def bufferEncoder: Encoder[ThetaBuf] = Encoders.javaSerialization[ThetaBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a long column into compact theta sketch bytes. */
  def thetaSketchAgg(c: Column): Column =
    udaf(new SketchAgg, Encoders.scalaLong).apply(c)

  private def sk(b: Array[Byte]): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(b))

  /** Distinct estimate of a sketch, rounded to a long. */
  val thetaEstimate: Column => Column = {
    val f = udf((b: Array[Byte]) => math.round(sk(b).getEstimate))
    c => f(c)
  }

  /** |A ∪ B| estimate from two compact sketches. */
  def thetaUnionEstimate(a: Column, b: Column): Column = {
    val f = udf((x: Array[Byte], y: Array[Byte]) => {
      val u = SetOperation.builder().buildUnion()
      u.union(sk(x)); u.union(sk(y))
      math.round(u.getResult.getEstimate)
    })
    f(a, b)
  }

  /** |A ∩ B| estimate from two compact sketches. */
  def thetaIntersectEstimate(a: Column, b: Column): Column = {
    val f = udf((x: Array[Byte], y: Array[Byte]) =>
      math.round(SetOperation.builder().buildIntersection()
        .intersect(sk(x), sk(y)).getEstimate))
    f(a, b)
  }

  /** |A \ B| estimate from two compact sketches. */
  def thetaDiffEstimate(a: Column, b: Column): Column = {
    val f = udf((x: Array[Byte], y: Array[Byte]) =>
      math.round(SetOperation.builder().buildANotB()
        .aNotB(sk(x), sk(y)).getEstimate))
    f(a, b)
  }
}
