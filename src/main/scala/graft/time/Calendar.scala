package graft.time

import java.time.{DayOfWeek, LocalDate}

/** Calendar helpers for the companion-index synthesis
  * (/root/reference/tsdisagg/time_conversion.py:157-253).
  *
  * Leap years use the full Gregorian rule via java.time — the reference's
  * `get_last_day` (time_conversion.py:157-165) omits the century rule; the
  * divergence only affects business-frequency endpoint snapping around
  * Feb 1900/2100, which no golden test exercises (SURVEY.md §1.4).
  */
object Calendar {

  /** Saturday/Sunday -> preceding Friday. */
  def rollWeekendBack(d: LocalDate): LocalDate = d.getDayOfWeek match {
    case DayOfWeek.SATURDAY => d.minusDays(1)
    case DayOfWeek.SUNDAY   => d.minusDays(2)
    case _                  => d
  }

  /** Saturday/Sunday -> following Monday. */
  def rollWeekendForward(d: LocalDate): LocalDate = d.getDayOfWeek match {
    case DayOfWeek.SATURDAY => d.plusDays(2)
    case DayOfWeek.SUNDAY   => d.plusDays(1)
    case _                  => d
  }

  /** business_cal_adjust (time_conversion.py:168-200): snap a span endpoint
    * onto the business calendar. Backward (`adjustForward = false`): move to
    * the first business day of the month; forward: to the last business day.
    */
  def businessAdjust(d: LocalDate, adjustForward: Boolean): LocalDate =
    if (!adjustForward) rollWeekendForward(d.withDayOfMonth(1))
    else rollWeekendBack(d.withDayOfMonth(d.lengthOfMonth))

  /** make_companion_index (time_conversion.py:224-253): the high-frequency
    * date spine spanning a low-frequency series. Start-anchored target
    * frequencies extend the END forward by (factor-1) high periods;
    * end-anchored extend the START backward. Business targets snap both
    * endpoints before generating.
    */
  def companionIndex(
      lowDates: IndexedSeq[LocalDate],
      lowFreq: Frequency,
      targetFreq: Frequency
  ): IndexedSeq[LocalDate] = {
    require(lowFreq.cls.order > targetFreq.cls.order,
      s"target_freq must be of higher frequency than the frequency on the data. Found " +
        s"target_freq ${targetFreq.name}, which is ${targetFreq.cls.longName}, while data is " +
        s"${lowFreq.name}, which is ${lowFreq.cls.longName}.")
    val offsetMonths = lowFreq.offsetMonthsTo(targetFreq).getOrElse(
      throw new IllegalArgumentException(
        s"Unsupported frequency pair ${lowFreq.name} -> ${targetFreq.name}"))
    var start = lowDates.head
    var end = lowDates.last
    if (targetFreq.isStart) end = end.plusMonths(offsetMonths.toLong)
    else start = start.minusMonths(offsetMonths.toLong)
    if (targetFreq.business) {
      start = businessAdjust(start, adjustForward = false)
      end = businessAdjust(end, adjustForward = true)
    }
    targetFreq.dateRange(start, end)
  }
}
