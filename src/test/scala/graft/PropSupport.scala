package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property harness over raw ScalaCheck generators
  * (the scalatest<->scalacheck bridge artifact is not in the offline cache). */
trait PropSupport {

  def forSamples[A](gen: Gen[A], n: Int = 120)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 4) {
      gen.apply(Gen.Parameters.default, seed).foreach { a =>
        produced += 1
        try f(a)
        catch {
          case e: Throwable =>
            throw new AssertionError(s"property failed on sample #$produced: $a", e)
        }
      }
      seed = seed.next
      attempts += 1
    }
    require(produced > n / 2, s"generator too sparse: $produced/$n")
  }

  def forSamples[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forSamples(Gen.zip(ga, gb))(t => f(t._1, t._2))

  def forSamples[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forSamples(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))
}
