package graft.tools

import scala.util.hashing.MurmurHash3

/** Throwaway microbench: per-shingle hashing cost of the old 64-pass
  * minhash signature vs the Kirsch–Mitzenmacher double-hash scheme. */
object SigBench {
  val NumHashes = 64
  def shingles(text: String): Array[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 3) Array(toks.mkString(" ")) else toks.sliding(3).map(_.mkString(" ")).toArray
  }
  def sigOld(text: String): Array[Int] = {
    val sh = shingles(text); val sig = Array.fill(NumHashes)(Int.MaxValue)
    var i = 0
    while (i < sh.length) {
      val s = sh(i); var h = 0
      while (h < NumHashes) { val v = MurmurHash3.stringHash(s, h); if (v < sig(h)) sig(h) = v; h += 1 }
      i += 1
    }
    sig
  }
  def sigNew(text: String): Array[Int] = {
    val sh = shingles(text); val sig = Array.fill(NumHashes)(Int.MaxValue)
    var i = 0
    while (i < sh.length) {
      val s = sh(i)
      val h1 = MurmurHash3.stringHash(s, 0); val h2 = MurmurHash3.stringHash(s, 1) | 1
      var h = 0; var v = h1
      while (h < NumHashes) { if (v < sig(h)) sig(h) = v; v += h2; h += 1 }
      i += 1
    }
    sig
  }
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val docs = (0 until 2000).map(_ => (0 until 500).map(_ => "w" + rnd.nextInt(30000)).mkString(" "))
    def bench(tag: String, f: String => Array[Int]): Double = {
      var sink = 0
      for (_ <- 0 until 2) docs.foreach(d => sink ^= f(d)(0))
      val t0 = System.nanoTime()
      docs.foreach(d => sink ^= f(d)(0))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sigbench] $tag: $dt%.2f s for 2000 x 500-word docs (sink=$sink)")
      dt
    }
    val o = bench("old 64-pass", sigOld)
    val n = bench("new double-hash", sigNew)
    println(f"[sigbench] speedup: ${o / n}%.1fx")
  }
}
