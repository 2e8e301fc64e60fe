package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's dim-guessing spec
  * (tests/test_array_like_reader.py:26-114, 718-728, 729-835). */
class DimsSpec extends AnyFunSuite {
  test("guess by rank: trailing TCZYX(S) suffix") {
    assert(Dims.guess(1) == "X")
    assert(Dims.guess(2) == "YX")
    assert(Dims.guess(3) == "ZYX")
    assert(Dims.guess(4) == "CZYX")
    assert(Dims.guess(5) == "TCZYX")
    assert(Dims.guess(6) == "TCZYXS")
  }

  test("unguessable ranks raise InvalidDimensionOrdering") {
    intercept[InvalidDimensionOrdering](Dims.guess(0))
    intercept[InvalidDimensionOrdering](Dims.guess(7))
  }

  test("explicit order validated against rank") {
    assert(Dims.validate("CYX", 3) == "CYX")
    assert(Dims.validate("ABCDEFGH", 8) == "ABCDEFGH") // non-standard ok
    intercept[ConflictingArguments](Dims.validate("ZYX", 4))
    intercept[ConflictingArguments](Dims.validate("XX", 2))
  }

  test("canonical order: S and M variants") {
    assert(Dims.canonicalFor("YX") == "TCZYX")
    assert(Dims.canonicalFor("TCZYXS") == "TCZYXS")
    assert(Dims.canonicalFor("MYX") == "MTCZYX")
    assert(Dims.canonicalFor("MTCZYXS") == "MTCZYXS")
  }

  test("Dimensions attribute access and toString") {
    val d = Dimensions("TCZYX", Seq(1, 2, 3, 4, 5))
    assert(d.T == 1 && d.C == 2 && d.Z == 3 && d.Y == 4 && d.X == 5)
    assert(d.toString == "<Dimensions [T: 1, C: 2, Z: 3, Y: 4, X: 5]>")
    intercept[NoSuchElementException](d('M'))
  }
}

class NDArraySpec extends AnyFunSuite {
  test("tabulate + strided access") {
    val a = NDArray.tabulate(Seq(2, 3, 4))(i => i(0) * 100.0 + i(1) * 10 + i(2))
    assert(a(1, 2, 3) == 123.0)
    assert(a(0, 0, 0) == 0.0)
    assert(a.shape == Seq(2, 3, 4))
    intercept[IllegalArgumentException](NDArray(Seq(2, 2), Array(1.0)))
  }
}
