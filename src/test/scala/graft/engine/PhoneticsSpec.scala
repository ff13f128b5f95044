package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.synth.NamePools

class PhoneticsSpec extends AnyFunSuite {
  import Phonetics._

  test("soundex standard vectors (incl. h/w rule)") {
    assert(soundex("robert") === "R163")
    assert(soundex("rupert") === "R163")
    assert(soundex("ashcraft") === "A261") // h transparent between s,c
    assert(soundex("ashcroft") === "A261")
    assert(soundex("tymczak") === "T522")
    assert(soundex("pfister") === "P236") // f merges into initial p
    assert(soundex("honeyman") === "H555")
    assert(soundex("smith") === "S530")
    assert(soundex("smyth") === "S530")
  }

  test("soundex padding and edge cases") {
    assert(soundex("lee") === "L000")
    assert(soundex("j") === "J000")
    assert(soundex("") === "")
  }

  test("every misspelling pair shares its soundex code, with every suffix combo") {
    for (((l, p), i) <- NamePools.last.zip(NamePools.misspellOfLast).zipWithIndex
         if l != p; s1 <- NamePools.lastSuffix; s2 <- NamePools.lastSuffix2) {
      assert(soundex(l + s1 + s2) === soundex(p + s1 + s2),
        s"pool index $i: $l$s1$s2 vs $p$s1$s2")
    }
  }

  test("nickname groups map both formal and nick to the formal name") {
    assert(NamePools.nicknameGroup("james") === "james")
    assert(NamePools.nicknameGroup("jim") === "james")
    assert(NamePools.nicknameGroup("peggy") === "margaret")
    assert(!NamePools.nicknameGroup.contains("zzz"))
  }

  test("nysiis published vectors") {
    assert(nysiis("knight") === "NAGT")
    assert(nysiis("macintosh") === "MCANT")
    assert(nysiis("phillipson") === "FALAPS")
    assert(nysiis("daniel") === "DANAL")
    assert(nysiis("bishop") === "BASAP")
    assert(nysiis("") === "")
  }

  test("nysiis groups misspelling pairs like the other coders") {
    val agree = NamePools.last.zip(NamePools.misspellOfLast)
      .count { case (l, p) => nysiis(l) == nysiis(p) }
    // nysiis is stricter than soundex; most (not all) pool pairs collapse
    assert(agree >= NamePools.last.length / 2)
  }

  test("onca and statcan vectors") {
    // ONCA = soundex of the nysiis key (published definition)
    assert(onca("knight") === soundex("nagt"))
    assert(onca("macintosh") === soundex("mcant"))
    assert(statcan("johnson") === "JNSN")
    assert(statcan("martinez") === "MRTN")
    assert(statcan("lee") === "L")
    assert(statcan("") === "")
  }

  test("metaphone groups phonetically equal surnames") {
    assert(metaphone("smith") === metaphone("smyth"))
    assert(metaphone("davis") === metaphone("davies"))
    assert(metaphone("johnson") === metaphone("jonson"))
    assert(metaphone("metaphone").nonEmpty)
    assert(metaphone("") === "")
  }
}
