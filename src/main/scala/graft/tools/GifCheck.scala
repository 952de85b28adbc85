package graft.tools

/** Scratch check: GIF fixture round-trips the exact cell formula hash. */
object GifCheck {
  def main(a: Array[String]): Unit = {
    var ok = 0
    var bad = 0
    (0L until 400L).foreach { id =>
      val gif = graft.functions.SynthCellGif.compute(id)
      val png = graft.functions.SynthCellPng.compute(id)
      val jpg = graft.functions.SynthGrayJpeg.compute(id)
      val hg = graft.functions.GifDhash.compute(gif)
      val hp = graft.functions.PngDhash.compute(png)
      val hj = graft.functions.JpegDhash.compute(jpg)
      if (hg != null && hg == hp && hg == hj) ok += 1
      else { bad += 1; if (bad < 5) println(s"id=$id gif=$hg png=$hp jpg=$hj") }
    }
    println(s"ok=$ok bad=$bad")
  }
}
