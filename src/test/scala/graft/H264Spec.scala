package graft

import graft.operators.H264
import graft.operators.H264.{SpsSpec, SpsInfo, PpsSpec, PpsInfo}

/** H.264 SPS codec gates: writer/parser round-trip across a parameter
  * grid, emulation-prevention escaping both ways, the avcC extraction
  * walk, and truncation/corruption fuzz — the discipline every media
  * parser here carries.
  */
class H264Spec extends SparkSpec {

  test("SPS round-trips across profiles, levels, resolutions, crops") {
    for {
      profile <- Seq(66, 77, 100) // baseline, main, high (chroma branch)
      level <- Seq(30, 41, 50)
      wMbs <- Seq(0, 19, 119) // 16 px .. 1920 px
      hUnits <- Seq(0, 33, 67)
      crop <- Seq((0, 0), (1, 1), (4, 2))
    } {
      val spec = SpsSpec(profile, level, wMbs, hUnits, crop._1, crop._2)
      val got = H264.parseSps(H264.buildSps(spec))
      assert(got.contains(SpsInfo(profile, level,
        spec.codedWidth, spec.codedHeight)), s"spec $spec -> $got")
    }
  }

  test("extended profiles BELOW 100 round-trip (44/83/86 carry the chroma block)") {
    // the r12 builder gated the chroma block on >= 100 while the parser
    // used the explicit §7.3.2.1.1 list — these profiles diverged
    for {
      profile <- Seq(44, 83, 86, 110, 122, 244)
      crop <- Seq((0, 0), (3, 1))
    } {
      val spec = SpsSpec(profile, 40, 39, 21, crop._1, crop._2)
      val got = H264.parseSps(H264.buildSps(spec))
      assert(got.contains(SpsInfo(profile, 40,
        spec.codedWidth, spec.codedHeight)), s"profile $profile -> $got")
    }
  }

  test("crop units follow chroma_format_idc: mono, 4:2:2, 4:4:4 decode per spec") {
    // 4:2:0 crops 2 px/unit both axes; 4:2:2 is (2,1); mono and 4:4:4
    // crop in luma samples — the r12 parser hard-coded (2,2) for all
    for {
      chroma <- Seq(0, 1, 2, 3)
      (cr, cb) <- Seq((0, 0), (1, 1), (4, 2))
    } {
      val spec = SpsSpec(100, 40, 39, 21, cr, cb, chromaFormatIdc = chroma)
      val got = H264.parseSps(H264.buildSps(spec))
      assert(got.contains(SpsInfo(100, 40,
        spec.codedWidth, spec.codedHeight)),
        s"chroma $chroma crop ($cr,$cb): ${spec.codedWidth}x${spec.codedHeight} -> $got")
    }
    // a non-extended profile cannot carry a non-4:2:0 format
    intercept[IllegalArgumentException] {
      H264.buildSps(SpsSpec(66, 30, 10, 10, 0, 0, chromaFormatIdc = 2))
    }
  }

  test("SEI payloadType 128 is a message, not the trailing marker") {
    // type byte 0x80 at a message boundary: the r12 parser stopped there
    // and dropped the rest of the chain
    val raw = Array(0x80.toByte, 2.toByte, 0x11.toByte, 0x22.toByte) ++ // type 128
      Array(6.toByte, 1.toByte, 0xa4.toByte) ++ // recovery point after it
      Array(0x80.toByte) // genuine rbsp_trailing_bits
    val nal = Array(0x06.toByte) ++ H264.escapeRbsp(raw)
    val got = H264.parseSei(nal)
    assert(got.exists(_.length == 2), s"got $got")
    assert(got.get.head.seiType == 128 && got.get.head.payloadSize == 2)
    assert(got.get(1).seiType == 6)
  }

  test("emulation prevention: escape inserts, unescape inverts, parse survives") {
    // raw RBSP with the exact hazard patterns of 14496-10 §7.4.1
    val hazards = Seq(
      Array[Byte](0, 0, 0),          // 00 00 00 -> 00 00 03 00
      Array[Byte](0, 0, 1),          // start-code collision
      Array[Byte](0, 0, 3),          // escape-byte collision
      Array[Byte](0, 0, 4),          // NOT escaped (byte > 3)
      Array[Byte](1, 0, 0, 2, 0, 0)) // trailing pair, mid-stream hit
    hazards.foreach { raw =>
      val escaped = H264.escapeRbsp(raw)
      assert(H264.unescapeRbsp(escaped).toSeq == raw.toSeq,
        s"round-trip failed for ${raw.mkString(",")}")
      // no un-escaped hazard survives: 00 00 0x with x <= 2 is illegal
      // in an escaped stream (00 00 03 IS the legal escape sequence)
      val s = escaped.map(_ & 0xff)
      (0 until s.length - 2).foreach { i =>
        assert(!(s(i) == 0 && s(i + 1) == 0 && s(i + 2) <= 2),
          s"hazard at $i in ${s.mkString(",")}")
      }
    }
    // a wide-resolution SPS whose ue codes carry long zero runs still
    // parses (the writer escapes, the parser unescapes)
    val spec = SpsSpec(66, 30, 1023, 511, 0, 0)
    assert(H264.parseSps(H264.buildSps(spec)).isDefined)
  }

  test("quarantine: truncations, wrong NAL type, scaling matrices") {
    val full = H264.buildSps(SpsSpec(77, 40, 39, 21, 1, 0))
    // every strict prefix either parses to None or not at all — never throws
    (0 until full.length).foreach { n =>
      H264.parseSps(full.take(n)) match {
        case Some(info) =>
          fail(s"truncated prefix of $n bytes parsed as $info")
        case None => ()
      }
    }
    // a non-SPS NAL type is refused
    val notSps = full.clone(); notSps(0) = 0x61.toByte
    assert(H264.parseSps(notSps).isEmpty)
  }

  test("avcC extraction finds the SPS; container fuzz quarantines") {
    val spec = SpsSpec(66, 31, 44, 25, 0, 1)
    val sps = H264.buildSps(spec)
    val mp4 = H264.buildAvcMp4(sps, spec.codedWidth, spec.codedHeight)
    assert(H264.extractSpsFromMp4(mp4).map(_.toSeq).contains(sps.toSeq))
    // every truncation of the container is a clean None
    Seq(3, 9, 40, mp4.length / 2, mp4.length - 3).foreach { n =>
      assert(H264.extractSpsFromMp4(mp4.take(n)).isEmpty, s"prefix $n")
    }
    // flipped box tag: no avc1 entry -> quarantine (the LAST occurrence
    // — the first "avc1" bytes sit inside the ftyp brand string)
    val noAvc = mp4.clone()
    val idx = noAvc.lastIndexOfSlice("avc1".getBytes("US-ASCII"))
    noAvc(idx) = 'x'.toByte
    assert(H264.extractSpsFromMp4(noAvc).isEmpty)
  }

  test("PPS round-trips across entropy modes, slice groups, QPs, flags") {
    for {
      cabac <- Seq(false, true)
      groupsM1 <- Seq(0, 1, 3) // single, FMO pair, four groups
      (l0, l1) <- Seq((1, 1), (4, 2), (16, 8))
      (wp, wbi) <- Seq((false, 0), (true, 1), (false, 2))
      qp <- Seq(-26, -10, 0, 9, 25) // negative se(v) exercised
      cqo <- Seq(-12, 0, 12)
    } {
      val spec = PpsSpec(cabac, groupsM1, l0, l1, wp, wbi, qp, cqo,
        deblockingControl = qp < 0, constrainedIntraPred = cqo > 0,
        redundantPicCntPresent = cabac)
      val got = H264.parsePps(H264.buildPps(spec))
      assert(got.contains(PpsInfo(0, 0, cabac, groupsM1 + 1, l0, l1,
        wp, wbi, 26 + qp, cqo, qp < 0, cqo > 0, cabac)),
        s"spec $spec -> $got")
    }
  }

  test("PPS quarantine: truncations, wrong NAL type never throw") {
    val full = H264.buildPps(PpsSpec(entropyCabac = true, 1, 4, 2,
      weightedPred = true, 2, -8, 2, deblockingControl = true,
      constrainedIntraPred = false, redundantPicCntPresent = true))
    (0 until full.length).foreach { n =>
      H264.parsePps(full.take(n)) match {
        case Some(info) => fail(s"truncated prefix of $n bytes parsed as $info")
        case None => ()
      }
    }
    val notPps = full.clone(); notPps(0) = 0x67.toByte
    assert(H264.parsePps(notPps).isEmpty)
  }

  test("avcC carries the PPS next to the SPS; both extract") {
    val sps = H264.buildSps(SpsSpec(77, 40, 39, 21, 0, 0))
    val pps = H264.buildPps(H264.ppsSpecFor(42L))
    val mp4 = H264.buildAvcMp4(sps, 640, 352, Seq(pps))
    assert(H264.extractSpsFromMp4(mp4).map(_.toSeq).contains(sps.toSeq))
    assert(H264.extractPpsFromMp4(mp4).map(_.toSeq).contains(pps.toSeq))
    // a PPS-less avcC (the pre-r12 layout) stays a clean None
    val noPps = H264.buildAvcMp4(sps, 640, 352)
    assert(H264.extractPpsFromMp4(noPps).isEmpty)
    assert(H264.extractSpsFromMp4(noPps).map(_.toSeq).contains(sps.toSeq))
    // container truncation fuzz hits the PPS walk too
    (0 until mp4.length by 7).foreach { n =>
      H264.extractPpsFromMp4(mp4.take(n)).foreach { got =>
        assert(n >= mp4.length || got.toSeq == pps.toSeq, s"prefix $n")
      }
    }
  }

  test("the PPS table face decodes every non-truncated doc to the id rule") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val got = H264.extractPpsInfo(spark,
      H264.synthesizeAvcTable(spark, docs)).collect()
      .map(r => r.getLong(0) -> (1 until 12).map(r.getLong).toVector).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      if (id % 13 == 0) assert(!got.contains(id), s"truncated $id leaked")
      else {
        val p = H264.ppsSpecFor(id)
        def b(x: Boolean) = if (x) 1L else 0L
        assert(got(id) == Vector(b(p.entropyCabac),
          p.numSliceGroupsMinus1 + 1L, p.numRefIdxL0.toLong,
          p.numRefIdxL1.toLong, b(p.weightedPred),
          p.weightedBipredIdc.toLong, 26L + p.initQpMinus26,
          p.chromaQpOffset.toLong, b(p.deblockingControl),
          b(p.constrainedIntraPred), b(p.redundantPicCntPresent)),
          s"id $id")
      }
    }
  }

  test("SEI round-trips: recovery point + UUID chain, ff-escape sizes, fuzz") {
    import graft.operators.H264.{SeiSpec, SeiMessage}
    for {
      cnt <- Seq(0, 1, 7, 29, 300) // ue sizes across byte boundaries
      em <- Seq(false, true)
      uuid <- Seq(None, Some(Array.tabulate(16)(i => (i * 17).toByte)))
    } {
      val spec = SeiSpec(cnt, em, brokenLink = !em, uuid)
      val got = H264.parseSei(H264.buildSei(spec))
      assert(got.isDefined, s"spec $spec")
      val msgs = got.get
      assert(msgs.head.seiType == 6 &&
        msgs.head.recoveryFrameCnt.contains(cnt) &&
        msgs.head.exactMatch.contains(em) &&
        msgs.head.brokenLink.contains(!em))
      uuid match {
        case Some(u) =>
          assert(msgs.length == 2 && msgs(1).seiType == 5 &&
            msgs(1).payloadSize == 21 &&
            msgs(1).uuidHex.contains(u.map(x => f"${x & 0xff}%02x").mkString))
        case None => assert(msgs.length == 1)
      }
    }
    // a long payload exercises the 0xff size-escape path
    val big = SeiSpec(0, exactMatch = true, brokenLink = false,
      userUuid = None)
    val longMsg = {
      // hand-build a type-200, 300-byte message + trailing marker
      val body = Array.fill(300)(0x11.toByte)
      val raw = Array(200.toByte) ++ Array(0xff.toByte, 45.toByte) ++ body ++
        Array(0x80.toByte)
      Array(0x06.toByte) ++ graft.operators.H264.escapeRbsp(raw)
    }
    val parsed = H264.parseSei(longMsg)
    assert(parsed.exists(m => m.length == 1 && m.head.seiType == 200 &&
      m.head.payloadSize == 300))
    // every truncation of a real SEI NAL is a clean None
    val full = H264.buildSei(SeiSpec(29, exactMatch = false,
      brokenLink = true, Some(Array.tabulate(16)(_.toByte))))
    (0 until full.length).foreach { n =>
      assert(H264.parseSei(full.take(n)).isEmpty, s"prefix $n")
    }
    val notSei = full.clone(); notSei(0) = 0x67.toByte
    assert(H264.parseSei(notSei).isEmpty)
    assert(big.recoveryFrameCnt == 0) // silence unused warning path
  }

  test("slice headers round-trip across types, frame numbers, POC values") {
    import graft.operators.H264.{SliceSpec, SliceInfo}
    val sps = H264.parseSps(H264.buildSps(SpsSpec(77, 40, 39, 21, 0, 0))).get
    for {
      (idr, st) <- Seq((true, 2), (true, 7), (false, 0), (false, 1),
        (false, 2), (false, 5))
      fn <- Seq(0, 7, 15)
      poc <- Seq(0, 9, 15)
    } {
      val spec = SliceSpec(idr, st, fn, poc, idrPicId = 3, firstMb = 11)
      val got = H264.parseSliceHeader(H264.buildSlice(spec), sps)
      assert(got.contains(SliceInfo(if (idr) 5 else 1, 11, st, fn,
        Some(poc), if (idr) Some(3) else None)), s"spec $spec -> $got")
    }
    // an IDR with a non-I slice_type is malformed per §7.4.3: quarantine
    assert(H264.parseSliceHeader(
      H264.buildSlice(SliceSpec(idr = false, 0, 1, 2)).updated(
        0, 0x65.toByte), sps).isEmpty)
    // the parser reads a header PREFIX by contract (no trailing-marker
    // requirement — real slices continue into entropy-coded data), so a
    // truncation either quarantines or yields EXACTLY the full parse;
    // it must never throw or misparse a field
    val full = H264.buildSlice(SliceSpec(idr = true, 7, 0, 5, idrPicId = 7))
    val fullParse = H264.parseSliceHeader(full, sps)
    assert(fullParse.isDefined)
    (0 until full.length).foreach { n =>
      H264.parseSliceHeader(full.take(n), sps).foreach { info =>
        assert(fullParse.contains(info), s"prefix $n misparsed as $info")
      }
    }
    // wrong NAL type refused
    assert(H264.parseSliceHeader(full.clone().updated(0, 0x67.toByte), sps)
      .isEmpty)
  }

  test("mdat slice stream extracts in order; the face follows the GOP rule") {
    val id = 43L
    val spec = H264.specFor(id)
    val slices = H264.sliceSpecsFor(id).map(H264.buildSlice)
    val mp4 = H264.buildAvcMp4(H264.buildSps(spec), spec.codedWidth,
      spec.codedHeight, Seq(H264.buildPps(H264.ppsSpecFor(id))),
      Some(H264.buildSei(H264.seiSpecFor(id))), slices)
    // the SEI sample rides FIRST; the slice walk skips it and returns
    // every slice NAL in stream order
    val got = H264.extractSliceNalsFromMp4(mp4)
    assert(got.exists(ns => ns.map(_.toSeq) == slices.map(_.toSeq)))
    // SEI/SPS/PPS walks are untouched by the appended slice samples
    assert(H264.extractSeiFromMp4(mp4).isDefined)
    assert(H264.extractSpsFromMp4(mp4).isDefined)
    assert(H264.extractPpsFromMp4(mp4).isDefined)
    // container truncation quarantines (never throws, never misparses)
    (0 until mp4.length by 5).foreach { n =>
      H264.extractSliceNalsFromMp4(mp4.take(n)).foreach { ns =>
        assert(n >= mp4.length || ns.map(_.toSeq) == slices.map(_.toSeq),
          s"prefix $n")
      }
    }
    // the table face: one row per slice per doc, values from the id rule
    val docs = Tables.documents(spark, sfDir).limit(80)
    val rows = H264.extractSliceInfo(spark,
      H264.synthesizeAvcTable(spark, docs)).collect()
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val byId = rows.groupBy(_.getLong(0))
    ids.foreach { i =>
      if (i % 13 == 0) assert(!byId.contains(i), s"truncated $i leaked")
      else {
        val want = H264.sliceSpecsFor(i)
        val ms = byId(i).sortBy(_.getLong(1))
        assert(ms.length == want.length, s"doc $i")
        ms.zip(want).foreach { case (r, w) =>
          assert(r.getLong(2) == (if (w.idr) 5L else 1L) &&
            r.getLong(4) == w.sliceType &&
            r.getLong(5) == w.frameNum &&
            r.getLong(6) == w.pocLsb, s"doc $i slice ${r.getLong(1)}")
          if (w.idr) assert(r.getLong(7) == w.idrPicId)
          else assert(r.isNullAt(7))
        }
      }
    }
  }

  test("mdat carries the SEI sample; extraction + face follow the id rule") {
    val id = 42L
    val spec = H264.specFor(id)
    val sei = H264.buildSei(H264.seiSpecFor(id))
    val mp4 = H264.buildAvcMp4(H264.buildSps(spec), spec.codedWidth,
      spec.codedHeight, Seq(H264.buildPps(H264.ppsSpecFor(id))), Some(sei))
    assert(H264.extractSeiFromMp4(mp4).map(_.toSeq).contains(sei.toSeq))
    // SPS/PPS walks are untouched by the trailing mdat
    assert(H264.extractSpsFromMp4(mp4).isDefined)
    assert(H264.extractPpsFromMp4(mp4).isDefined)
    // an mdat-less payload stays a clean None
    val noMdat = H264.buildAvcMp4(H264.buildSps(spec), 640, 352)
    assert(H264.extractSeiFromMp4(noMdat).isEmpty)
    // the table face: one recovery row per doc, a UUID row on id % 3 == 0
    val docs = Tables.documents(spark, sfDir).limit(60)
    val rows = H264.extractSeiInfo(spark,
      H264.synthesizeAvcTable(spark, docs)).collect()
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val byId = rows.groupBy(_.getLong(0))
    ids.foreach { i =>
      if (i % 13 == 0) assert(!byId.contains(i), s"truncated $i leaked")
      else {
        val ms = byId(i).sortBy(_.getLong(1))
        val want = if (i % 3 == 0) 2 else 1
        assert(ms.length == want, s"doc $i")
        assert(ms.head.getLong(2) == 6L &&
          ms.head.getLong(5) == i % 30)
      }
    }
  }

  test("the table face decodes every non-truncated doc to the id rule") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val got = H264.extractCodecInfo(spark,
      H264.synthesizeAvcTable(spark, docs)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      if (id % 13 == 0) assert(!got.contains(id), s"truncated $id leaked")
      else {
        val s = H264.specFor(id)
        assert(got(id) == ((s.profileIdc.toLong, s.levelIdc.toLong,
          s.codedWidth.toLong, s.codedHeight.toLong)), s"id $id")
      }
    }
  }
}
