package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scratch diagnostics for the spatial corpus (deleted before commit). */
class DebugSpatialSpec extends AnyFunSuite {
  test("hilbert calibration") {
    // expected: (0,-1)->10921 (0,0)->10922 (0,1)->32767 (1,0)->54613
    //           (10,10)->32973 (20,20)->33204
    val cases = Seq((0.0, -1.0, 10921L), (0.0, 0.0, 10922L), (0.0, 1.0, 32767L),
      (1.0, 0.0, 54613L), (10.0, 10.0, 32973L), (20.0, 20.0, 33204L))
    def norm(x: Double, y: Double): (Long, Long) = {
      val p = 256L
      (((x + 180) * (p - 1) / 360d).toLong, ((y + 90) * (p - 1) / 180d).toLong)
    }
    for ((x, y, exp) <- cases) {
      val (nx, ny) = norm(x, y)
      val v1 = graft.functions.Spatial2.hilbertXY2D(8, nx, ny)
      val v2 = graft.functions.Spatial2.hilbertXY2D(8, ny, nx)
      val v3 = graft.functions.Spatial2.hilbertXY2D(8, 255 - nx, ny)
      val v4 = graft.functions.Spatial2.hilbertXY2D(8, nx, 255 - ny)
      val v5 = graft.functions.Spatial2.hilbertXY2D(8, 255 - ny, nx)
      val v6 = graft.functions.Spatial2.hilbertXY2D(8, ny, 255 - nx)
      val v7 = graft.functions.Spatial2.hilbertXY2D(8, 255 - nx, 255 - ny)
      val v8 = graft.functions.Spatial2.hilbertXY2D(8, 255 - ny, 255 - nx)
      println(s"($x,$y) norm=($nx,$ny) exp=$exp got: xy=$v1 yx=$v2 fxy=$v3 xfy=$v4 fyx=$v5 yfx=$v6 fxfy=$v7 fyfx=$v8")
    }
  }
}
