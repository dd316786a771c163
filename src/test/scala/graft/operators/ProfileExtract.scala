package graft.operators

/** Dev micro-profile for KilidTransform.extract (Test/runMain
  * graft.operators.ProfileExtract) — isolates per-page cost of the
  * parse vs the selector extraction on a representative gate page. */
object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val page =
      """<html><body><nav aria-label="breadcrumb"><a href="/">کیلید</a><a>اجاره</a><a>tehran</a><a>منطقه</a><a>fa</a></nav>""" +
        """<div class="relative"><img src="https://cdn.kilid.com/1.jpg"/><img src="https://other.com/z.jpg"/></div>""" +
        """<div class="flex items-center justify-center gap-1">انتشار <span class="font-semiBold">3 روز پیش</span></div>""" +
        """<h1 class="text-lg font-semibold">عنوان اگهی تستی</h1>""" +
        """<div class="flex flex-col items-end justify-center"><span class="text-lg font-bold">5 میلیون</span></div>""" +
        """<div class="flex flex-col items-end justify-center"><span class="text-lg font-bold">200 هزار</span></div>""" +
        """<div class="inline-flex items-center bg-gray-50">نوع سند: تک برگ شش دانگ</div>""" +
        (1 to 5).map(i =>
          s"""<div class="group flex items-center justify-center"><span class="text-nowrap">ویژگی$i</span> مقدار$i</div>""").mkString +
        """<div class="group flex items-center justify-center"><span class="text-nowrap">متراژ ۶۶ متر</span></div>""" +
        """<div class="group flex items-center justify-center"><span class="text-nowrap">ساخت ۱۳۸۵</span></div>""" +
        """<div class="grid grid-cols-2"><div class="flex justify-start gap-2"><span class="text-gray-600">کلید:</span><span class="font-semiBold">مقدار</span></div></div>""" +
        """<div class="transition-all duration-300">توضیحات کامل اگهی</div>""" +
        """</body></html>"""
    println("PAGE_LEN=" + page.length)
    def bench(tag: String, n: Int)(f: => Unit): Unit = {
      var i = 0; while (i < n) { f; i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0; while (i < n) { f; i += 1 }
      println(f"PROF $tag%-10s ${(System.nanoTime() - t0) / 1e3 / n}%.1f us/page")
    }
    bench("parse", 5000)(graft.sources.HtmlLite.parse(page))
    bench("extract", 5000)(KilidTransform.extract(page, "اجاره"))
  }
}
