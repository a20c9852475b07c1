package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.AttributeValue

class AttributeValueSpec extends AnyFunSuite {

  test("decodes the full tag set") {
    val in =
      """{"s":{"S":"hi"},"n":{"N":"1.50"},"b":{"B":"Zm9v"},"t":{"BOOL":true},
         |"z":{"NULL":true},"l":{"L":[{"S":"a"},{"N":"2"}]},
         |"m":{"M":{"inner":{"S":"x"}}},
         |"ss":{"SS":["a","b"]},"ns":{"NS":["1","2.5"]},"bs":{"BS":["YQ=="]}}"""
        .stripMargin.replaceAll("\n", "")
    val out = AttributeValue.decode(in)
    assert(out.contains(""""s":"hi""""))
    assert(out.contains(""""n":1.50""")) // decimal fidelity: no double roundtrip
    assert(out.contains(""""t":true"""))
    assert(out.contains(""""z":null"""))
    assert(out.contains(""""l":["a",2]"""))
    assert(out.contains(""""m":{"inner":"x"}"""))
    assert(out.contains(""""ss":["a","b"]"""))
    assert(out.contains(""""ns":[1,2.5]"""))
  }

  test("keeps 38-digit N exactness (no double corruption)") {
    val big = "12345678901234567890123456789.123456789"
    val out = AttributeValue.decode(s"""{"x":{"N":"$big"}}""")
    assert(out === s"""{"x":$big}""")
  }

  test("nested M-in-L-in-M survives") {
    val in = """{"a":{"M":{"b":{"L":[{"M":{"c":{"N":"7"}}}]}}}}"""
    assert(AttributeValue.decode(in) === """{"a":{"b":[{"c":7}]}}""")
  }

  test("null in, null out") {
    assert(AttributeValue.decode(null) === null)
  }

  test("depth bound rejects pathological nesting instead of truncating") {
    val deep = (1 to 40).foldLeft("""{"S":"x"}""") { (acc, _) =>
      s"""{"M":{"k":$acc}}"""
    }
    assertThrows[IllegalArgumentException] {
      AttributeValue.decode(s"""{"root":$deep}""")
    }
  }

  test("unknown tag rejected") {
    assertThrows[IllegalArgumentException] {
      AttributeValue.decode("""{"x":{"Q":"?"}}""")
    }
  }

  test("decode ∘ encode is the identity on plain JSON documents") {
    val docs = Seq(
      """{"pk":"u1","n":1.50,"ok":true,"z":null}""",
      """{"l":["a",2,false],"m":{"x":{"y":[1,2]}}}""",
      """{"big":12345678901234567890123456789.123456789}""",
      """{"empty":{},"elist":[]}""")
    docs.foreach { d =>
      assert(AttributeValue.decode(AttributeValue.encode(d)) === d)
    }
  }

  test("decode ∘ encode identity holds for exponent-notation numbers") {
    // writeRawValue keeps the textual form; BigDecimal re-rendering would
    // turn "1e2" into "1E+2" and break the round trip
    val docs = Seq(
      """{"a":1e2,"b":1E2,"c":-2.5e-3,"d":0.0,"e":1.0E+10}""",
      """{"ns":{"x":[1e2,3E-1]}}""")
    docs.foreach { d =>
      assert(AttributeValue.decode(AttributeValue.encode(d)) === d)
    }
  }

  test("non-JSON but DynamoDB-legal N spellings normalize; non-numeric rejected") {
    assert(AttributeValue.decode("""{"a":{"N":"+5"},"b":{"N":"05"}}""")
      === """{"a":5,"b":5}""")
    assertThrows[NumberFormatException] {
      AttributeValue.decode("""{"a":{"N":"abc"}}""")
    }
  }

  test("SS/BS/NS reject non-string elements instead of emitting punctuation") {
    assertThrows[IllegalArgumentException] {
      AttributeValue.decode("""{"s":{"SS":["ok",{"S":"nested"}]}}""")
    }
    assertThrows[IllegalArgumentException] {
      AttributeValue.decode("""{"s":{"BS":[["arr"]]}}""")
    }
    assertThrows[IllegalArgumentException] {
      AttributeValue.decode("""{"s":{"NS":[1]}}""") // must be number STRINGS
    }
    assert(AttributeValue.decode("""{"s":{"SS":["a","b"]},"n":{"NS":["1","2.5"]}}""")
      === """{"s":["a","b"],"n":[1,2.5]}""")
  }

  test("encode tags every JSON kind correctly") {
    val out = AttributeValue.encode("""{"s":"hi","n":2.5,"b":false,"z":null,"l":[1],"m":{"k":"v"}}""")
    assert(out === """{"s":{"S":"hi"},"n":{"N":"2.5"},"b":{"BOOL":false},""" +
      """"z":{"NULL":true},"l":{"L":[{"N":"1"}]},"m":{"M":{"k":{"S":"v"}}}}""")
  }

  test("decode ∘ encode is the identity on RANDOM plain JSON documents (property)") {
    import org.scalacheck.{Gen, Prop}
    val genScalar: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(s => "\"" + s.take(8) + "\""),
      Gen.choose(-1000000L, 1000000L).map(_.toString),
      Gen.choose(-9999.99, 9999.99).map(d => f"$d%.2f"),
      Gen.oneOf("true", "false", "null"),
      Gen.choose(1, 300).map(e => s"1e$e"),
      Gen.const("12345678901234567890123456789.123456789"))
    def genValue(depth: Int): Gen[String] =
      if (depth <= 0) genScalar
      else Gen.frequency(
        4 -> genScalar,
        1 -> Gen.listOfN(3, genValue(depth - 1)).map(_.mkString("[", ",", "]")),
        1 -> Gen.listOfN(3, genValue(depth - 1))
          .map(vs => vs.zipWithIndex.map { case (v, i) => s""""k$i":$v""" }
            .mkString("{", ",", "}")))
    val genDoc: Gen[String] = Gen.listOfN(4, genValue(3))
      .map(vs => vs.zipWithIndex.map { case (v, i) => s""""f$i":$v""" }
        .mkString("{", ",", "}"))
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(200).withWorkers(1)
    val res = org.scalacheck.Test.check(params,
      Prop.forAll(genDoc) { d =>
        AttributeValue.decode(AttributeValue.encode(d)) == d
      })
    assert(res.passed, res.status.toString)
  }

  test("hinted set encode emits SS/NS/BS with dedup-on-write") {
    val hints = Map("tags" -> "SS", "ids" -> "NS", "blobs" -> "BS")
    val out = AttributeValue.encode(
      """{"tags":["a","b","a"],"ids":[1,1.0,2],"blobs":["Zm9v","Zm9v"],"plain":["a","a"]}""",
      hints)
    // first occurrence wins; NS dedups by NUMERIC equality ("1.0" dups "1")
    assert(out === """{"tags":{"SS":["a","b"]},"ids":{"NS":["1","2"]},""" +
      """"blobs":{"BS":["Zm9v"]},"plain":{"L":[{"S":"a"},{"S":"a"}]}}""")
  }

  test("set hints reach dotted paths inside M but never inside L") {
    val out = AttributeValue.encode(
      """{"meta":{"ids":[3,3]},"wrap":[{"ids":[4,4]}]}""",
      Map("meta.ids" -> "NS", "wrap.ids" -> "NS"))
    // meta.ids is a hinted map field -> NS set; the SAME field name under
    // a list element is unnamed ("wrap[].ids") and stays L, undeduped
    assert(out === """{"meta":{"M":{"ids":{"NS":["3"]}}},""" +
      """"wrap":{"L":[{"M":{"ids":{"L":[{"N":"4"},{"N":"4"}]}}}]}}""")
  }

  test("set encode rejects empty sets, wrong element kinds, and non-array hints") {
    assertThrows[IllegalArgumentException] {
      AttributeValue.encode("""{"tags":[]}""", Map("tags" -> "SS"))
    }
    assertThrows[IllegalArgumentException] {
      AttributeValue.encode("""{"tags":[1,2]}""", Map("tags" -> "SS"))
    }
    assertThrows[IllegalArgumentException] {
      AttributeValue.encode("""{"ids":["x"]}""", Map("ids" -> "NS"))
    }
    assertThrows[IllegalArgumentException] {
      AttributeValue.encode("""{"tags":"scalar"}""", Map("tags" -> "SS"))
    }
    assertThrows[IllegalArgumentException] {
      AttributeValue.encode("""{"tags":["a"]}""", Map("tags" -> "XX"))
    }
  }

  test("parseSetHints parses the SQL spelling and rejects malformed specs") {
    assert(AttributeValue.parseSetHints("tags:SS, meta.ids:NS ,b:BS")
      === Map("tags" -> "SS", "meta.ids" -> "NS", "b" -> "BS"))
    assertThrows[IllegalArgumentException] {
      AttributeValue.parseSetHints("tags=SS")
    }
    assertThrows[IllegalArgumentException] {
      AttributeValue.parseSetHints("tags:LIST")
    }
  }

  test("decode ∘ encode is the identity on set payloads (property)") {
    import org.scalacheck.{Gen, Prop}
    // unique elements: on the duplicate-free domain the round trip is the
    // exact identity (with duplicates it is identity-after-dedup, covered
    // by the dedup test above)
    val genSS = Gen.listOfN(4, Gen.alphaNumStr.map(_.take(6)))
      .map(_.distinct).suchThat(_.nonEmpty)
    val genNS = Gen.listOfN(4, Gen.choose(-100000L, 100000L))
      .map(_.distinct).suchThat(_.nonEmpty)
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(200).withWorkers(1)
    val res = org.scalacheck.Test.check(params,
      Prop.forAll(genSS, genNS) { (ss, ns) =>
        val doc = s"""{"tags":[${ss.map("\"" + _ + "\"").mkString(",")}],""" +
          s""""ids":[${ns.mkString(",")}]}"""
        val rt = AttributeValue.decode(
          AttributeValue.encode(doc, Map("tags" -> "SS", "ids" -> "NS")))
        rt == doc
      })
    assert(res.passed, res.status.toString)
    // and the set TYPING itself round-trips through the tagged form
    val tagged = AttributeValue.encode(
      """{"tags":["a","b"],"ids":[1,2]}""", Map("tags" -> "SS", "ids" -> "NS"))
    assert(tagged.contains(""""SS"""") && tagged.contains(""""NS""""))
  }

  test("encode depth bound rejects pathological nesting") {
    val deep = (1 to 40).foldLeft(""""x"""") { (acc, _) => s"""{"k":$acc}""" }
    assertThrows[IllegalArgumentException] {
      AttributeValue.encode(s"""{"root":$deep}""")
    }
  }
}
