package graft.faers

import java.nio.file.{Files, Path}

/** Deterministic synthetic FAERS quarter generator — writes the 7
  * `$`-separated landing files (DEMO/DRUG/REAC/OUTC/INDI/RPSR/THER
  * <YY>Q<N>.txt) at a caller-chosen case count, with realistic grain:
  * 1-3 drugs and 1-2 reactions per case (fact fan-out ≈ 3× cases),
  * sparse outcomes/indications/reports/therapy exactly like quarterly
  * FAERS extracts. Everything is a pure function of the case index, so
  * two runs produce byte-identical files (benchable, diffable).
  *
  * Used by the pipeline benchmark (`graft.Bench`) and scale tests; the
  * tiny hand-written fixture in PipelineSpec stays the semantics gate.
  */
object SyntheticQuarter {

  private val drugs = Vector(
    "ASPIRIN", "IBUPROFEN", "ACETAMINOPHEN", "METFORMIN", "LISINOPRIL",
    "ATORVASTATIN", "AMLODIPINE", "OMEPRAZOLE", "SIMVASTATIN", "LOSARTAN",
    "GABAPENTIN", "SERTRALINE", "FLUOXETINE", "AMOXICILLIN", "AZITHROMYCIN",
    "PREDNISONE", "TRAMADOL", "WARFARIN", "CLOPIDOGREL", "PANTOPRAZOLE",
    "FUROSEMIDE", "METOPROLOL", "ALPRAZOLAM", "CETIRIZINE", "MONTELUKAST",
    "DULOXETINE", "VENLAFAXINE", "INSULIN GLARGINE", "LEVOTHYROXINE", "RAMIPRIL")

  private val reactions = Vector(
    "NAUSEA", "HEADACHE", "DIZZINESS", "RASH", "FATIGUE", "VOMITING",
    "DIARRHOEA", "PRURITUS", "DYSPNOEA", "INSOMNIA", "ANXIETY",
    "HYPERTENSION", "HYPOTENSION", "TACHYCARDIA", "SYNCOPE", "SEIZURE",
    "ANAPHYLACTIC REACTION", "CARDIAC ARREST", "HEPATOTOXICITY", "DEATH")

  private val indications = Vector(
    "HYPERTENSION", "DIABETES MELLITUS", "LUNG CANCER", "DEPRESSION",
    "RHEUMATOID ARTHRITIS", "ASTHMA", "ATRIAL FIBRILLATION", "PAIN")

  private val countries = Vector("US", "DE", "FR", "JP", "GB", "CA")

  /** `salt` perturbs a slice of attributes (weights, one drug per case)
    * so a later quarter re-reports some cases with CHANGED values — the
    * input that makes SCD2 merges close versions instead of no-oping.
    * salt=0 reproduces the original quarter exactly.
    */
  def write(dir: String, nCases: Int, yy: Int = 25, q: Int = 1,
            salt: Int = 0): Unit = {
    val d = Path.of(dir)
    Files.createDirectories(d)
    def writer(prefix: String, header: String): java.io.PrintWriter = {
      val w = new java.io.PrintWriter(Files.newBufferedWriter(
        d.resolve(f"$prefix$yy%02dQ$q.txt")))
      w.println(header)
      w
    }
    val demo = writer("DEMO",
      "primaryid$caseid$caseversion$i_f_code$event_dt$mfr_dt$init_fda_dt$fda_dt$rept_cod$auth_num$mfr_num$mfr_sndr$lit_ref$age$age_cod$age_grp$sex$e_sub$wt$wt_cod$rept_dt$to_mfr$occp_cod$reporter_country$occr_country")
    val drug = writer("DRUG",
      "primaryid$caseid$drug_seq$role_cod$drugname$prod_ai$val_vbm$route$dose_vbm$cum_dose_chr$cum_dose_unit$dechal$rechal$lot_num$exp_dt$nda_num$dose_amt$dose_unit$dose_form$dose_freq")
    val reac = writer("REAC", "primaryid$caseid$pt$drug_rec_act")
    val outc = writer("OUTC", "primaryid$caseid$outc_cod")
    val indi = writer("INDI", "primaryid$caseid$indi_drug_seq$indi_pt")
    val rpsr = writer("RPSR", "primaryid$caseid$rpsr_cod")
    val ther = writer("THER",
      "primaryid$caseid$dsg_drug_seq$start_dt$end_dt$dur$dur_cod")
    try {
      var i = 0
      while (i < nCases) {
        val pid = 1000000 + i
        val month = 1 + i % 3
        val day = 1 + i % 28
        val eventDt = if (i % 23 == 0) f"2024$month%02d" // partial date (repair path)
                      else f"2024$month%02d$day%02d"
        val age = if (i % 17 == 0) "" else (i % 95).toString
        val sex = (i % 3) match { case 0 => "F"; case 1 => "M"; case _ => "" }
        // with salt != 0, every 5th case reports a changed weight (the
        // SCD2 tracked-column delta a follow-up quarter carries)
        val wt = if (i % 7 == 0) ""
          else if (salt != 0 && i % 5 == 0) (50 + (i + salt) % 80).toString
          else (50 + i % 80).toString
        val cc = countries(i % countries.size)
        demo.println(
          s"$pid$$$pid$$1$$I$$$eventDt$$$$2024${"%02d".format(month)}15$$2024${"%02d".format(month)}20$$" +
          s"${Seq("EXP", "PER", "DIR")(i % 3)}$$$$$$$$$$$age$$YR$$$$$sex$$Y$$$wt$$KG$$" +
          s"2024${"%02d".format(month)}15$$$$MD$$$cc$$$cc")
        val nDrugs = 1 + i % 3
        var s = 1
        while (s <= nDrugs) {
          val name = drugs((i + s) % drugs.size)
          // every 5th drug row carries punctuation noise (standardization path)
          val noisy = if ((i + s) % 5 == 0) s"  $name!!" else name
          val dose = (i + s) % 4 match {
            case 0 => s"${50 * (1 + (i + s) % 10)} MG, DAILY"
            case 1 => s"${10 * (1 + (i + s) % 5)}MG"
            case 2 => ""
            case _ => "UNKNOWN"
          }
          val role = if (s == 1) "PS" else if (s == 2) "SS" else "C"
          drug.println(s"$pid$$$pid$$$s$$$role$$$noisy$$$name$$1$$" +
            s"${if ((i + s) % 2 == 0) "ORAL" else "IV"}$$$dose$$$$$$$$$$$$$$$$$$$$$$")
          s += 1
        }
        val nReac = 1 + i % 2
        var r = 0
        while (r < nReac) {
          val pt = reactions((i + 7 * r) % reactions.size)
          val act = if (i % 5 == 0) "1" else ""
          reac.println(s"$pid$$$pid$$$pt$$$act")
          r += 1
        }
        if (i % 4 == 0) {
          outc.println(s"$pid$$$pid$$${Seq("DE", "HO", "LT", "OT")(i % 16 / 4)}")
          if (i % 16 == 0) outc.println(s"$pid$$$pid$$HO")
        }
        if (i % 2 == 0)
          indi.println(s"$pid$$$pid$$1$$${indications(i % indications.size)}")
        if (i % 5 == 0)
          rpsr.println(s"$pid$$$pid$$${Seq("HP", "CSM", "FGN")(i % 15 / 5)}")
        if (i % 3 == 0)
          ther.println(s"$pid$$$pid$$1$$2024${"%02d".format(month)}01$$" +
            s"2024${"%02d".format(month)}28$$${1 + i % 90}$$DY")
        i += 1
      }
    } finally Seq(demo, drug, reac, outc, indi, rpsr, ther).foreach(_.close())
  }
}
