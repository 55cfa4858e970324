package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Property-style tests (seeded random corpus) pinning the hand-written
  * kernel loops to their reference models (Java split(" ", -1) + md5 hex +
  * the documented folds).
  */
class TextOpsPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
  private def randWord(): String =
    (0 until rnd.nextInt(7)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  private def randText(): String =
    (0 until rnd.nextInt(12)).map(_ => randWord()).mkString(" ")
  private def forAll(gen: () => String)(body: String => Unit): Unit =
    (Seq("", " ", "a", "a b", "a  b c") ++ (1 to 300).map(_ => gen())).foreach(body)

  private def u(s: String) = UTF8String.fromString(s)

  private def modelHash(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    hex.take(12).map {
      case c if c >= 'a' && c <= 'f' => ('1' + (c - 'a')).toChar
      case c => c
    }.toLong
  }

  test("portableHash == md5-translate-parse model") {
    forAll(randText _) { s =>
      assert(TextOps.portableHash(u(s)) == modelHash(s))
    }
  }

  test("shingles == split-model n-grams") {
    forAll(randText _) { s =>
      val toks = s.split(" ", -1).toSeq
      val expected =
        if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      val got = TextOps.shingles(u(s), 3)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(got == expected)
    }
  }

  test("fingerprint == ordered fold model") {
    forAll(randText _) { s =>
      val expected = s.split(" ", -1).foldLeft(0L) { (acc, t) =>
        (acc * 131L + modelHash(t)) % 1000000007L
      }
      assert(TextOps.fingerprint(u(s)) == expected)
    }
  }

  test("simhash16 == distinct sign-sum model and is duplicate-invariant") {
    forAll(randText _) { s =>
      val distinct = s.split(" ", -1).distinct
      val expected = (0 until 16).map { j =>
        val sum = distinct.map { t =>
          if (((modelHash(t) >> j) & 1L) == 1L) 1 else -1
        }.sum
        if (sum > 0) 1L << j else 0L
      }.sum
      assert(TextOps.simhash16(u(s)) == expected)
      assert(TextOps.simhash16(u(s + " " + s)) ==
        TextOps.simhash16(u(s))) // duplicating tokens never changes the set
    }
  }

  test("binaryChecksum == positional byte model") {
    val byteGen = () => {
      val b = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(b); b
    }
    (Seq(Array.empty[Byte]) ++ (1 to 300).map(_ => byteGen())).foreach { bytes =>
      val expected = bytes.zipWithIndex.map { case (b, i) =>
        (b & 0xff).toLong * (((i + 1) % 7) + 1)
      }.sum % 1000000007L
      assert(TextOps.binaryChecksum(bytes) == expected)
    }
  }

  test("repStats == split-model counters on random corpora") {
    import org.apache.spark.sql.types.LongType
    forAll(randText _) { s =>
      val toks = s.split(" ", -1).toSeq
      val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val expected = Seq(
        toks.length.toLong,
        toks.distinct.length.toLong,
        toks.groupBy(identity).values.map(_.length).max.toLong,
        math.max(0, toks.length - 1).toLong,
        grams.distinct.length.toLong)
      val got = TextOps.repStats(u(s)).toArray[Long](LongType).toSeq
      assert(got == expected, s"for text '$s'")
    }
  }

}
